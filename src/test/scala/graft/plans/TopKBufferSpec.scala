package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Differential test: the bounded heap must agree with sort-based top-k on
  * random streams, including merges (the map-side/reduce-side path) and
  * duplicate scores (tie-break: score desc, id asc). */
class TopKBufferSpec extends AnyFunSuite {

  private def reference(items: Seq[(Double, Long)], k: Int) =
    items.sortBy { case (s, id) => (-s, id) }.take(k)

  test("random streams: heap == sort for many (n, k) shapes") {
    val rnd = new Random(42)
    for (trial <- 1 to 50) {
      val n = rnd.nextInt(2000) + 1
      val k = rnd.nextInt(50) + 1
      // duplicate-heavy score space to exercise ties
      val items = Seq.fill(n)((rnd.nextInt(20).toDouble / 4.0,
        rnd.nextInt(500).toLong))
      val buf = new TopKBuffer(k)
      items.foreach { case (s, id) => buf.add(s, id) }
      assert(buf.sorted.toSeq == reference(items, k),
        s"trial $trial n=$n k=$k")
    }
  }

  test("random partial merges == global top-k") {
    val rnd = new Random(7)
    for (trial <- 1 to 20) {
      val k = rnd.nextInt(20) + 1
      val partitions = Seq.fill(rnd.nextInt(8) + 2)(
        Seq.fill(rnd.nextInt(500))((rnd.nextDouble(), rnd.nextInt(10000).toLong)))
      val partials = partitions.map { p =>
        val b = new TopKBuffer(k)
        p.foreach { case (s, id) => b.add(s, id) }
        b
      }
      val merged = new TopKBuffer(k)
      partials.foreach(merged.mergeFrom)
      assert(merged.sorted.toSeq == reference(partitions.flatten, k),
        s"trial $trial k=$k")
    }
  }

  test("serialize/deserialize round-trips through the aggregate") {
    val agg = TopKByScore(null, null, 5)
    val buf = new TopKBuffer(5)
    Seq((0.5, 1L), (0.9, 2L), (0.9, 1L), (0.1, 3L), (0.7, 9L), (0.8, 4L))
      .foreach { case (s, id) => buf.add(s, id) }
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.sorted.toSeq == buf.sorted.toSeq)
  }
}
