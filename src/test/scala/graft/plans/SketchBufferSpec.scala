package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Differential/property tests for the round-5 sketch buffers: the
  * Misra-Gries guarantee and merge law, and the Bloom bitset's
  * merge-order independence — the invariants the distributed aggregates
  * (`graft_misra_gries`, `graft_bloom_agg`) rely on. */
class SketchBufferSpec extends AnyFunSuite {

  test("Misra-Gries: every term with freq > n/(k+1) survives any " +
    "partitioning/merge shape; size stays <= k; n is exact") {
    val rnd = new Random(11)
    for (trial <- 1 to 40) {
      val k = rnd.nextInt(30) + 2
      // zipf-ish stream over a vocab larger than k
      val vocab = (1 to k * 4).map(i => s"t$i")
      val stream = Seq.fill(rnd.nextInt(4000) + 100)(
        vocab(math.min(vocab.size - 1,
          (math.pow(rnd.nextDouble(), 3) * vocab.size).toInt)))
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
      // random partitioning into partial buffers, then a random-order
      // pairwise merge (models any map/reduce tree)
      val parts = stream.grouped(rnd.nextInt(stream.size) + 1).toSeq
      val bufs = parts.map { p =>
        val b = new MGBuffer(k); p.foreach(b.add); b
      }
      val merged = rnd.shuffle(bufs).reduce { (a, b) =>
        a.mergeFrom(b); a
      }
      assert(merged.n == stream.size.toLong, s"trial $trial: n exact")
      assert(merged.counts.size <= k, s"trial $trial: bounded")
      val bound = stream.size.toDouble / (k + 1)
      exact.filter(_._2 > bound).foreach { case (t, c) =>
        assert(merged.counts.contains(t),
          s"trial $trial: $t (freq $c > $bound) must survive k=$k")
      }
      // estimates never exceed true counts, and undercount by <= n/(k+1)
      merged.counts.foreach { case (t, est) =>
        val truth = exact.getOrElse(t, 0L)
        assert(est <= truth && truth - est <= bound.toLong + 1,
          s"trial $trial: $t est=$est truth=$truth")
      }
    }
  }

  test("Misra-Gries: serialize/deserialize round-trips counts and n") {
    val agg = MisraGriesSketch(null, 8)
    val buf = new MGBuffer(8)
    ("the quick brown fox the the quick".split(" ") ++
      Seq("unicode-é中")).foreach(buf.add)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.n == buf.n && back.k == buf.k &&
      back.counts.toMap == buf.counts.toMap)
  }

  test("Bloom bitset: OR-merge is order-independent and equals the " +
    "single-pass build; serialize round-trips") {
    val rnd = new Random(23)
    for (trial <- 1 to 20) {
      val log2Bits = rnd.nextInt(10) + 8
      val positions = Seq.fill(rnd.nextInt(3000))(
        rnd.nextLong(1L << log2Bits))
      val whole = new BitsetBuffer(log2Bits)
      positions.foreach(whole.set)
      val parts = positions.grouped(rnd.nextInt(positions.size + 1) + 1)
        .map { p =>
          val b = new BitsetBuffer(log2Bits); p.foreach(b.set); b
        }.toSeq
      val merged = rnd.shuffle(parts)
        .foldLeft(new BitsetBuffer(log2Bits)) { (acc, b) =>
          acc.orFrom(b); acc
        }
      assert(merged.words.toSeq == whole.words.toSeq, s"trial $trial")
      val agg = BloomBitsetAgg(null, log2Bits)
      val back = agg.deserialize(agg.serialize(merged))
      assert(back.words.toSeq == merged.words.toSeq, s"trial $trial")
    }
  }
}
