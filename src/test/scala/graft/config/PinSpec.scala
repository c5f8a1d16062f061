package graft.config

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** The scale-aware pin switch (round 18): `spark.graft.pin.reliable`
  * routes every engine pin through a RELIABLE `Dataset.checkpoint`
  * (survives executor loss) instead of `localCheckpoint`. The contract
  * under test: identical results either way, and the reliable path
  * actually writes to the checkpoint directory. */
class PinSpec extends SparkFunSuite {

  test("reliable pins produce identical results and hit the " +
      "checkpoint dir") {
    val s = spark
    import s.implicits._
    val docs = (0L until 200L).map(i =>
      (i, s"alpha beta gamma delta ${i % 7} tail ${i % 3}"))
      .toDF("doc_id", "text")

    def run(): Seq[String] =
      graft.operators.Dedup.simhashNearDup(docs, "text", "doc_id")
        .orderBy($"a", $"b").collect().map(_.toString).toSeq

    val local = run()

    val ckDir = java.nio.file.Files
      .createTempDirectory("graft_pin_spec").toString
    s.sparkContext.setCheckpointDir(ckDir)
    s.conf.set("spark.graft.pin.reliable", "true")
    try {
      val rel = run()
      assert(rel == local,
        "reliable pins must not change operator results")
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckDir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, "reliable pin must write checkpoint files")
    } finally s.conf.set("spark.graft.pin.reliable", "false")
  }

  test("pinLazy defers materialization until first use, both modes") {
    val s = spark
    import s.implicits._
    import graft.config.Pin._
    val base = (0L until 50L).toDF("v")
    assert(base.pinLazy().agg(sum($"v")).head().getLong(0) == 1225L)
    s.conf.set("spark.graft.pin.reliable", "true")
    try assert(base.pinLazy().agg(sum($"v")).head().getLong(0) == 1225L)
    finally s.conf.set("spark.graft.pin.reliable", "false")
  }
}
