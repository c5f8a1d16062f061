package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text-canonicalization kernels.
  *
  * Web-scale corpora mix byte-identical-looking strings that differ only
  * in Unicode encoding (composed `é` vs `e`+combining-acute), which
  * silently defeats exact dedup, shingle hashing, and fingerprinting.
  * Spark has no NFC built-in, so this is a native expression: pure-ASCII
  * input (numBytes == numChars — the dominant case on real corpora) is
  * NFC by definition and returns the input UTF8String with zero
  * allocation; non-ASCII input that is already NFC pays one toString for
  * the `Normalizer.isNormalized` check; only strings that actually need
  * composition pay the full normalize round-trip. Codegen-friendly via a
  * static kernel call like the other graft kernels. */
object UnicodeKernels {

  // Windows-1252's 27 specials in the 0x80-0x9F band (everything else
  // in cp1252 coincides with Latin-1) — the inverse map a mojibake
  // repair needs to turn "â€™" back into the 0xE2 0x80 0x99 bytes of
  // a right single quote. 0x81/0x8D/0x8F/0x90/0x9D are unassigned.
  private val Cp1252Inverse: java.util.HashMap[Char, Byte] = {
    val m = new java.util.HashMap[Char, Byte]()
    val pairs = Seq(
      0x20ac -> 0x80, 0x201a -> 0x82, 0x0192 -> 0x83, 0x201e -> 0x84,
      0x2026 -> 0x85, 0x2020 -> 0x86, 0x2021 -> 0x87, 0x02c6 -> 0x88,
      0x2030 -> 0x89, 0x0160 -> 0x8a, 0x2039 -> 0x8b, 0x0152 -> 0x8c,
      0x017d -> 0x8e, 0x2018 -> 0x91, 0x2019 -> 0x92, 0x201c -> 0x93,
      0x201d -> 0x94, 0x2022 -> 0x95, 0x2013 -> 0x96, 0x2014 -> 0x97,
      0x02dc -> 0x98, 0x2122 -> 0x99, 0x0161 -> 0x9a, 0x203a -> 0x9b,
      0x0153 -> 0x9c, 0x017e -> 0x9e, 0x0178 -> 0x9f)
    pairs.foreach { case (c, b) => m.put(c.toChar, b.toByte) }
    m
  }

  /** Mojibake repair (round 13) — the ftfy core move: text that was
    * UTF-8 on the wire but decoded as Latin-1/Windows-1252 somewhere
    * upstream ("Ã©" for "é", "â€™" for a right quote) is detected and
    * un-done by reversing the wrong decode (chars < 0x100 map to their
    * own byte; the 27 cp1252 specials map back into 0x80-0x9F) and
    * strict-re-decoding as UTF-8. The repair fires ONLY when the whole
    * reverse-mapped byte string is VALID UTF-8 that actually shrinks —
    * genuine Latin-1 text ("café" with a real é byte) fails the strict
    * decode and passes through untouched; pure ASCII short-circuits on
    * the numBytes==numChars fast path. Double-encoded mojibake is
    * unwound to a fixpoint (≤ 3 passes — ftfy's own bound in practice).
    * The residual risk (legitimate text that happens to parse as
    * UTF-8) is the standard trade-off every mojibake fixer makes;
    * corpus curation wants the fix overwhelmingly more often. */
  def fixMojibake(s: UTF8String): UTF8String = {
    if (s.numBytes() == s.numChars()) return s // pure ASCII
    var cur = s.toString
    var changed = false
    var pass = 0
    var done = false
    while (pass < 3 && !done) {
      pass += 1
      val n = cur.length
      val bytes = new Array[Byte](n)
      var i = 0
      var mappable = true
      while (i < n && mappable) {
        val c = cur.charAt(i)
        if (c < 0x100) bytes(i) = c.toByte
        else {
          val b = Cp1252Inverse.get(c)
          if (b == null) mappable = false else bytes(i) = b.byteValue()
        }
        i += 1
      }
      if (!mappable) done = true
      else {
        val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        try {
          val decoded =
            dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
          // a real un-decode always shrinks (multi-byte seq -> 1 char);
          // equality means the bytes were plain ASCII/no-op
          if (decoded.length < cur.length) { cur = decoded; changed = true }
          else done = true
        } catch {
          case _: java.nio.charset.CharacterCodingException => done = true
        }
      }
    }
    if (changed) UTF8String.fromString(cur) else s
  }

  def nfc(s: UTF8String): UTF8String = {
    // pure ASCII (numBytes == numChars) is NFC by definition: byte scan,
    // zero allocation — the dominant case on real web corpora
    if (s.numBytes() == s.numChars()) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** `graft_fix_mojibake(text)` → `text` with UTF-8-decoded-as-
  * Latin-1/cp1252 damage reversed (see [[UnicodeKernels.fixMojibake]]);
  * clean text passes through unchanged. */
case class FixMojibake(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    UnicodeKernels.fixMojibake(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernels = "graft.plans.UnicodeKernels"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernels.fixMojibake($c);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "graft_fix_mojibake"
}

/** `graft_nfc(text)` → the NFC (canonical composition) form of `text`. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    UnicodeKernels.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernels = "graft.plans.UnicodeKernels"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernels.nfc($c);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "graft_nfc"
}
