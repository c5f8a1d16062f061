package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** Transition-edge extraction + deterministic fixed-point PageRank. */
class GraphSpec extends SparkFunSuite {

  private val S = 1000000000000L

  private def edgesOf(rows: Seq[(String, Long, Long)]) = {
    val s = spark
    import s.implicits._
    // (actor, seq, node): order by seq within actor
    Graph.transitionEdges(rows.toDF("actor", "seq", "node"),
      actor = col("actor"), node = col("node"), order = Seq(col("seq")))
  }

  test("transitionEdges pairs consecutive rows per actor and weights") {
    val e = edgesOf(Seq(
        ("u1", 1L, 10L), ("u1", 2L, 20L), ("u1", 3L, 10L),
        ("u2", 1L, 20L), ("u2", 2L, 30L),
        ("u3", 1L, 10L), ("u3", 2L, 20L))) // repeats (10,20)
      .orderBy("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(e.toSeq == Seq((10L, 20L, 2L), (20L, 10L, 1L), (20L, 30L, 1L)))
  }

  test("single-row actors contribute no edges") {
    val e = edgesOf(Seq(("u1", 1L, 10L), ("u2", 1L, 20L)))
    assert(e.count() == 0)
  }

  test("pageRank on a symmetric 2-cycle stays at the uniform fixed point") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L, 1L), (2L, 1L, 1L)).toDF("src", "dst", "w")
    val pr = Graph.pageRank(edges, iters = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // N=2: pr0 = S/2; teleport = 3S/40; contrib = pr; 17·(S/2)/20 + 3S/40
    // = S/2 exactly — the uniform vector is the integer fixed point
    assert(pr == Map(1L -> S / 2, 2L -> S / 2))
  }

  test("pageRank hand-computed on a dangling 2-node chain") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L, 1L)).toDF("src", "dst", "w")
    val teleport = (S * 3) / 40
    val pr1 = Graph.pageRank(edges, iters = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(pr1 == Map(
      1L -> teleport,
      2L -> (teleport + 17L * (S / 2) / 20)))
    val pr2 = Graph.pageRank(edges, iters = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(pr2 == Map(
      1L -> teleport,
      2L -> (teleport + 17L * teleport / 20)))
  }

  test("degreeStats full-outer profile on a hand-checked graph") {
    val s = spark
    import s.implicits._
    // 1→2 (w3), 1→3 (w1), 2→3 (w2): node 1 pure source, 3 pure sink
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 2L))
      .toDF("src", "dst", "w")
    val got = Graph.degreeStats(edges).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(
      1L -> ((2L, 0L, 4L, 0L)),
      2L -> ((1L, 1L, 2L, 3L)),
      3L -> ((0L, 2L, 0L, 3L))))
  }

  test("personalized PageRank: teleport mass stays relative to the seed") {
    val s = spark
    import s.implicits._
    // seed 1 feeds 2; node 3 is disconnected from the seed (self-loop
    // keeps it in the node set) and must decay to zero mass
    val edges = Seq((1L, 2L, 1L), (2L, 1L, 1L), (3L, 3L, 1L))
      .toDF("src", "dst", "w")
    val pr = Graph.personalizedPageRank(edges, seeds = Seq(1L), iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(pr(3L) == 0L, "unreachable node holds no personalized mass")
    assert(pr(1L) > 0L && pr(2L) > 0L)
    // absent seed still counts in |seeds|: halving the start/teleport
    val half = Graph.personalizedPageRank(edges, seeds = Seq(1L, 99L),
        iters = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(half(1L) == 1000000000000L / 2)
  }

  test("components: two chains and a self-loop resolve to min labels") {
    val s = spark
    import s.implicits._
    // 1-2-3 chained, 7-8 chained, 9 self-loop
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (8L, 7L, 1L),
      (9L, 9L, 1L)).toDF("src", "dst", "w")
    val got = Graph.components(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L,
      9L -> 9L))
  }

  test("components: star and min-label kernels agree on the real " +
      "transition graph (the graph_components oracle input)") {
    val edges = Graph.transitionEdges(
      graft.queries.Q.events(spark, sfDir),
      actor = col("user_id"),
      node = get_json_object(col("props"), "$.k").cast("long"),
      order = Seq(col("ts"), col("event_id")))
      .filter(col("w") >= 2)
    val viaStar = Graph.components(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val ids = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
    val viaMinLabel = Dedup.survivorsFromPairs(ids,
        edges.select(col("src").as("a"), col("dst").as("b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaStar == viaMinLabel && viaStar.nonEmpty)
  }

  test("pageRank is invariant under edge repartitioning") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val edges = (0 until 60).map { _ =>
      (rnd.nextInt(8).toLong, rnd.nextInt(8).toLong, (rnd.nextInt(5) + 1).toLong)
    }.toDF("src", "dst", "w")
      .groupBy("src", "dst").agg(sum("w").as("w"))
    val a = Graph.pageRank(edges, iters = 3).collect().toSeq
    val b = Graph.pageRank(edges.repartition(13), iters = 3).collect().toSeq
    assert(a == b)
  }
}
