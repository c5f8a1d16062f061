package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native signature kernels for the LSH dedup family.
  *
  * The same signatures are expressible with SQL higher-order functions
  * (see `graft.functions.TextFunctions`), but HOF lambdas are interpreted:
  * a 64-hash minhash over ~400 shingles costs ~25k lambda-tree evaluations
  * PER ROW (measured ~30s for 10k docs at sf0.1). These expressions run
  * the inner loop as tight JVM code — one string hash per shingle, then
  * splitmix64 remixes per hash function — turning the signature step into
  * a sub-second scan. They participate in whole-stage codegen via a direct
  * kernel call ([[doGenCode]]), like [[AvroDecodeEnvelope]].
  */
object HashKernels {

  /** xxhash64-style avalanche over Spark's own UTF8String bytes; seed 42
    * matches the engine-default hash family (the family is engine-defined,
    * only determinism matters). */
  def baseHash(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)

  /** splitmix64 finalizer — cheap independent remix per hash index. */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def minhash(shingles: ArrayData, numHashes: Int,
      preHashed: Boolean): Array[Long] = {
    val n = shingles.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val h = if (preHashed) shingles.getLong(i)
          else baseHash(shingles.getUTF8String(i))
        var k = 0
        while (k < numHashes) {
          val v = mix(h ^ (k.toLong * 0xc2b2ae3d27d4eb4fL))
          if (v < sig(k)) sig(k) = v
          k += 1
        }
      }
      i += 1
    }
    sig
  }

  def simhash(shingles: ArrayData, preHashed: Boolean): Long = {
    val votes = new Array[Int](64)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val h = if (preHashed) shingles.getLong(i)
          else baseHash(shingles.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** Hashes of the k-word shingles of a pre-normalized text (single-space
    * separated), computed in ONE pass with zero string materialization:
    * per-token hashes, then an order-sensitive mix-chain per window.
    * Documents shorter than k tokens yield one whole-document shingle
    * (mirrors `TextFunctions.wordShingles`). Empty text → empty array. */
  def wordShingleHashes(text: UTF8String, k: Int): Array[Long] = {
    val s = text.toString
    if (s.isEmpty) return Array.emptyLongArray
    // token hashes without substring allocation
    var tokenHashes = new Array[Long](16)
    var nTok = 0
    var start = 0
    var i = 0
    val len = s.length
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        if (i > start) {
          if (nTok == tokenHashes.length)
            tokenHashes = java.util.Arrays.copyOf(tokenHashes, nTok * 2)
          var h = 0xcbf29ce484222325L
          var j = start
          while (j < i) { h = (h ^ s.charAt(j)) * 0x100000001b3L; j += 1 }
          tokenHashes(nTok) = mix(h)
          nTok += 1
        }
        start = i + 1
      }
      i += 1
    }
    if (nTok == 0) return Array.emptyLongArray
    if (nTok < k) {
      // whole-doc shingle
      var h = 0x9e3779b97f4a7c15L
      var t = 0
      while (t < nTok) { h = mix(h * 0xff51afd7ed558ccdL ^ tokenHashes(t)); t += 1 }
      return Array(h)
    }
    val out = new Array[Long](nTok - k + 1)
    var w = 0
    while (w <= nTok - k) {
      var h = 0x9e3779b97f4a7c15L
      var t = w
      while (t < w + k) { h = mix(h * 0xff51afd7ed558ccdL ^ tokenHashes(t)); t += 1 }
      out(w) = h
      w += 1
    }
    out
  }

  /** Hashes of the character n-grams of a pre-normalized text, one rolling
    * pass. Texts shorter than n yield one whole-text hash. */
  def charNgramHashes(text: UTF8String, n: Int): Array[Long] = {
    val s = text.toString
    val len = s.length
    if (len == 0) return Array.emptyLongArray
    if (len < n) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < len) { h = (h ^ s.charAt(j)) * 0x100000001b3L; j += 1 }
      return Array(mix(h))
    }
    val out = new Array[Long](len - n + 1)
    var i = 0
    while (i <= len - n) {
      var h = 0xcbf29ce484222325L
      var j = i
      while (j < i + n) { h = (h ^ s.charAt(j)) * 0x100000001b3L; j += 1 }
      out(i) = mix(h)
      i += 1
    }
    out
  }

  /** Karp-Rabin polynomial fingerprint of a pre-normalized (ASCII,
    * single-space-canonical) text: fold `acc*B + codepoint (mod 2^41)` left
    * to right. Unlike the xxhash64-chain fingerprint, every step is plain
    * integer arithmetic on codepoints, so an independent engine (the DuckDB
    * oracle) reproduces it exactly with a list fold. B = 1000003 and
    * M = 2^41 keep `acc*B + c < 2^62` — no overflow anywhere. */
  def polyFingerprint(text: UTF8String): Long = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val n = text.numBytes()
    val M = 1L << 41
    var acc = 0L
    var i = 0
    while (i < n) {
      val c = org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0xff
      acc = (acc * 1000003L + c) % M
      i += 1
    }
    acc
  }

  /** Random-hyperplane signature: plane component (b, j) is a deterministic
    * splitmix64 value scaled to [-1, 1] — reproducible on every executor
    * with no RNG state or broadcast plane matrix. */
  def hyperplane(vec: ArrayData, nBits: Int, seed: Long): Long = {
    val dim = vec.numElements()
    var sig = 0L
    var b = 0
    while (b < nBits) {
      var acc = 0.0
      var j = 0
      while (j < dim) {
        val plane = mix(seed ^ (b.toLong << 32) ^ j.toLong).toDouble /
          Long.MaxValue.toDouble
        acc += vec.getFloat(j) * plane
        j += 1
      }
      if (acc > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** `minhash_sig(shingles, H)` → array<bigint> of length H. Accepts
  * array<string> (hashes each shingle) or array<bigint> (pre-hashed
  * shingles from [[ShingleHashes]] — the fast path). */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0 && numHashes <= 1024)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  @transient private lazy val preHashed: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == LongType
  // public so generated code can call it directly
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      HashKernels.minhash(input.asInstanceOf[ArrayData], numHashes, preHashed))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashExpr", this,
      classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$self.nullSafeEval($c);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "graft_minhash_sig"
}

/** `simhash64(shingles)` → bigint fingerprint. Accepts array<string> or
  * pre-hashed array<bigint>. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  @transient private lazy val preHashed: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == LongType
  override def nullSafeEval(input: Any): Any =
    HashKernels.simhash(input.asInstanceOf[ArrayData], preHashed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simhashExpr", this,
      classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (Long) $self.nullSafeEval($c);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "graft_simhash64"
}

/** `shingle_hashes(normalizedText, k, byChar)` → array<bigint>: the hashed
  * k-shingle SET of a pre-normalized text in one native pass — no shingle
  * strings are ever materialized, and the output is sorted + deduplicated
  * so downstream set operations ([[JaccardSortedSets]]) are single merge
  * scans. This is the LSH-dedup front-end: at sf0.1 the HOF string-shingle
  * construction dominated the whole dedup runtime; this expression makes
  * shingling ~free relative to the scan. */
case class ShingleHashes(child: Expression, k: Int, byChar: Boolean)
    extends UnaryExpression {
  require(k > 0 && k <= 64)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String]
    val raw =
      if (byChar) HashKernels.charNgramHashes(text, k)
      else HashKernels.wordShingleHashes(text, k)
    java.util.Arrays.sort(raw)
    // in-place dedupe of the sorted hashes → true set semantics
    var w = 0
    var i = 0
    while (i < raw.length) {
      if (w == 0 || raw(i) != raw(w - 1)) { raw(w) = raw(i); w += 1 }
      i += 1
    }
    new GenericArrayData(
      if (w == raw.length) raw else java.util.Arrays.copyOf(raw, w))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingleExpr", this,
      classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$self.nullSafeEval($c);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String =
    if (byChar) "graft_char_ngram_hashes" else "graft_word_shingle_hashes"
}

/** `cosine_sim(a, b)` over two array<float>/array<double> vectors: one
  * native pass accumulating dot product and both norms in doubles, with
  * the SAME left-to-right accumulation and final `dot / (sqrt(na)*sqrt(nb))`
  * op order as the HOF formulation it replaces — results stay bit-identical
  * (the sim_topk oracle matches DuckDB's doubles exactly). 0.0 when either
  * norm is 0. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  @transient private lazy val leftIsDouble =
    left.dataType.asInstanceOf[ArrayType].elementType == DoubleType
  @transient private lazy val rightIsDouble =
    right.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = if (leftIsDouble) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (rightIsDouble) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("cosineExpr", this,
      classOf[CosineSimilarity].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (Double) $self.nullSafeEval($a, $b);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "graft_cosine_sim"
}

/** `jaccard_sorted(a, b)` over two SORTED-DISTINCT array<bigint> sets
  * (the [[ShingleHashes]] output contract): one O(|a|+|b|) merge scan —
  * `array_intersect`/`array_union` build a hash set per row pair, which
  * dominated the LSH verify stage at sf0.1. Empty ∪ empty → 1.0 (two empty
  * documents are identical). */
case class JaccardSortedSets(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    if (nx == 0 && ny == 0) return 1.0
    var i = 0; var j = 0; var inter = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    inter.toDouble / (nx + ny - inter).toDouble
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("jaccardExpr", this,
      classOf[JaccardSortedSets].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (Double) $self.nullSafeEval($a, $b);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "graft_jaccard_sorted"
}

/** `poly_fingerprint(normalizedText)` → bigint Karp-Rabin fingerprint
  * (see [[HashKernels.polyFingerprint]]). Input contract: pre-normalized
  * ASCII text ([[graft.functions.TextFunctions.normalize]] output) — the
  * byte fold then equals the codepoint fold any SQL engine can express. */
case class PolyFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    HashKernels.polyFingerprint(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernels = "graft.plans.HashKernels"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $kernels.polyFingerprint($c);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "graft_poly_fingerprint"
}

/** `hyperplane_sig(vec, nBits, seed)` → bigint sign-bit signature over an
  * array<float> embedding. */
case class HyperplaneSignature(child: Expression, nBits: Int, seed: Long)
    extends UnaryExpression {
  require(nBits > 0 && nBits <= 64)
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    HashKernels.hyperplane(input.asInstanceOf[ArrayData], nBits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hyperplaneExpr", this,
      classOf[HyperplaneSignature].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (Long) $self.nullSafeEval($c);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "graft_hyperplane_sig"
}
