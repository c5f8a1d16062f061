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

  def nfc(s: UTF8String): UTF8String = {
    // pure ASCII (numBytes == numChars) is NFC by definition: byte scan,
    // zero allocation — the dominant case on real web corpora
    if (s.numBytes() == s.numChars()) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
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
