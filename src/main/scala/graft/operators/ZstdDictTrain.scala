package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Raw-content dictionary TRAINING (round 14) — the `zstd --train`
  * analog for the corpus export path: pick the corpus's most
  * frequent fixed-length grams and concatenate them into a shared
  * prefix window, most-frequent LAST (closest offsets — zstd offsets
  * price distance, so the hottest content belongs at the dictionary
  * tail, exactly how COVER lays real dictionaries out).
  *
  * This is deliberately the GREEDY frequency heuristic, not COVER's
  * suffix-automaton optimization: the produced dictionary is a plain
  * raw-content dict (no entropy tables), consumed by
  * [[ZstdEncode.compress(content,prefix)*]] and any `zstd -D` reader.
  * On boilerplate-heavy corpora (WARC headers, JSON keys, HTML tags)
  * it captures most of COVER's win at a fraction of the machinery.
  *
  * 100 TB shape: ONE distributed scan explodes documents into
  * stride-sampled grams (stride = gram/2 halves the exploded row
  * count while still covering every byte twice... every boundary
  * once), a count aggregate with map-side partial combine, and a
  * `TakeOrderedAndProject` top-k — only k·partitions rows ever reach
  * the driver. Training on a SAMPLE (`sampleFraction`) is the
  * standard practice; the dictionary quality saturates long before
  * the corpus does. */
object ZstdDictTrain {

  /** Train a raw dictionary: top-`k` grams of length `gram` by
    * document frequency-weighted count, deduplicated against
    * containment in already-selected grams, concatenated
    * least-frequent-first, capped at `maxBytes`. Deterministic:
    * ties break by gram text. */
  def trainRawDict(df: DataFrame, textCol: String,
      gram: Int = 16, k: Int = 512, maxBytes: Int = 4096,
      sampleFraction: Double = 1.0): Array[Byte] = {
    require(gram >= 4 && k > 0 && maxBytes >= gram)
    val docs =
      if (sampleFraction >= 1.0) df
      else df.sample(withReplacement = false, sampleFraction, seed = 7)
    val grams = docs
      .select(col(textCol).cast("string").as("t"))
      .where(length(col("t")) >= gram)
      // stride-sampled sliding shingles via sequence + substring —
      // declarative, codegen'd, no UDF
      .select(explode(sequence(lit(1),
        (length(col("t")) - gram + 1),
        lit(math.max(1, gram / 2)))).as("p"), col("t"))
      .select(expr(s"substring(t, p, $gram)").as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("g"))
      .limit(k)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // containment dedup: a gram already inside the growing dictionary
    // adds no new window content
    val chosen = Vector.newBuilder[String]
    var used = 0
    var dictSoFar = ""
    grams.iterator.takeWhile(_ => used < maxBytes).foreach {
      case (g, _) =>
        if (used + g.getBytes("UTF-8").length <= maxBytes &&
          !dictSoFar.contains(g)) {
          chosen += g
          dictSoFar += g
          used += g.getBytes("UTF-8").length
        }
    }
    // most frequent LAST = nearest offsets
    chosen.result().reverse.mkString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
}
