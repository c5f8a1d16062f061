package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class LayoutSpec extends SparkFunSuite {
  import spark.implicits._

  /** Scalar Morton reference: interleave bit i of x to 2i, y to 2i+1. */
  private def mortonRef(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (z, i) =>
      z | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue16 matches the bit-interleave reference over samples") {
    val pts = for {
      x <- Seq(0L, 1L, 2L, 255L, 256L, 4097L, 65535L)
      y <- Seq(0L, 1L, 3L, 128L, 32767L, 65535L)
    } yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zValue16(col("x"), col("y")).as("z"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == mortonRef(x, y), s"z($x,$y)")
    }
  }

  test("pruneAudit: hand-checked file envelopes and box hits") {
    // 8 rows, 4-row files under natural order: file 0 covers x 0..3,
    // file 1 covers x 10..13; box x in [10,11] hits only file 1
    val df = (0L until 4L).map(i => (i, 5L, i))
      .++((0L until 4L).map(i => (i + 10L, 5L, i + 4L)))
      .toDF("x", "y", "ord")
    val r = Layout.pruneAudit(df, "x", "y", Seq(col("ord")), 4,
      10L, 11L, 0L, 9L).head()
    assert(r.getAs[Long]("n_files") == 2L)
    assert(r.getAs[Long]("files_hit") == 1L)
    assert(r.getAs[Long]("rows_scanned") == 4L)
    assert(r.getAs[Long]("rows_matched") == 2L)
  }

  test("z-order layout prunes a box the natural layout cannot") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(pmod(col("l_partkey"), lit(65536)).as("x"),
        pmod(col("l_suppkey"), lit(65536)).as("y"),
        col("l_orderkey"), col("l_linenumber"))
    // sf0.001 keys span partkey 0..199, suppkey 0..9 — box inside that
    val natural = Layout.pruneAudit(li, "x", "y",
      Seq(col("l_orderkey"), col("l_linenumber")), 512,
      32L, 63L, 2L, 3L).head()
    val zed = Layout.pruneAudit(
      li.withColumn("z", Layout.zValue16(col("x"), col("y"))),
      "x", "y", Seq(col("z"), col("l_orderkey"), col("l_linenumber")),
      512, 32L, 63L, 2L, 3L).head()
    assert(natural.getAs[Long]("rows_matched") ==
      zed.getAs[Long]("rows_matched"), "matches are layout-invariant")
    assert(natural.getAs[Long]("rows_matched") > 0L, "box must be non-empty")
    assert(zed.getAs[Long]("rows_scanned") <
      natural.getAs[Long]("rows_scanned"),
      s"zorder must scan fewer rows: ${zed.getAs[Long]("rows_scanned")}" +
        s" vs ${natural.getAs[Long]("rows_scanned")}")
  }
}
