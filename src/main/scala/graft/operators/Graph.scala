package graft.operators

import graft.config.Pin._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Link-graph analytics for corpus curation (builder extension surface —
  * the reference has no joins or aggregations at all, SURVEY.md §2.2).
  *
  * Authority scoring over a link/transition graph is a standard quality
  * signal for web-scale training corpora: Common-Crawl-style harvesters
  * weight sources by domain PageRank, and session-transition graphs rank
  * hub pages. Both reduce to the same two-stage shape implemented here:
  * a corpus-scale EDGE EXTRACTION (the only pass that touches the raw
  * log) followed by iterations over the aggregated edge relation, whose
  * size is bounded by distinct (src, dst) pairs — node², not corpus rows.
  */
object Graph {

  /** Per-actor transition edges: order each actor's rows by `order`,
    * pair every row with its successor, and aggregate to weighted edges
    * `(src, dst, w)`.
    *
    * Scale shape: ONE shuffle keyed by actor (the `lead` window), then a
    * map-side-combined count — the 100 TB event log reduces to the
    * node²-bounded edge relation in a single pass. Actor history skew is
    * the usual window caveat; a hot actor's history lands in one task,
    * which is inherent to ordered sessionization (same contract as the
    * funnel/session queries). */
  def transitionEdges(df: DataFrame, actor: Column, node: Column,
      order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col("__actor")).orderBy(order: _*)
    df.select(Seq(actor.as("__actor"), node.as("src")) ++ order: _*)
      .withColumn("dst", lead(col("src"), 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** Per-node degree/weight profile of a weighted edge relation —
    * `(node, out_deg, in_deg, out_w, in_w)` with distinct-neighbor
    * degrees and total transition weights. The basic graph health check
    * before authority scoring (hubs, sinks, weight skew); two
    * map-side-combined aggregates over the node²-bounded edge relation. */
  def degreeStats(edges: DataFrame): DataFrame = {
    val out = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_deg"), sum(col("w")).as("out_w"))
    val in = edges.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("in_deg"), sum(col("w")).as("in_w"))
    out.join(in, Seq("node"), "full")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        coalesce(col("out_w"), lit(0L)).as("out_w"),
        coalesce(col("in_w"), lit(0L)).as("in_w"))
      .orderBy(col("node"))
  }

  /** Weakly-connected components of an edge relation — the community
    * structure of a link graph (run on the STRONG-edge subgraph, e.g.
    * `w ≥ k`, to find genuinely cohesive clusters; the full graph of a
    * busy log is usually one giant component). Delegates to the
    * large-star/small-star kernel [[Dedup.survivorsFromPairsStar]]:
    * identical output contract to the min-label kernel (smallest
    * reachable id — the kernel-equality spec pins it), but O(log n)
    * rounds instead of O(diameter) — a chain/tree-shaped web graph with
    * diameter in the hundreds converges in ~10 Spark rounds, not ~500.
    * Output: `(node, component)`, component = smallest reachable node
    * id; isolated nodes (no qualifying edge) are not in the node set. */
  def components(edges: DataFrame): DataFrame = {
    // Materialize the edge relation ONCE (round 17): `edges` usually
    // hides the corpus-scale extraction (a window over the raw log),
    // and it feeds BOTH the node universe and the pair kernel — the
    // un-pinned plan re-ran the whole extraction for the final
    // label join (measured: the extraction jobs appeared twice per
    // run). Same discipline as [[materializeGraph]]. Retention
    // (round-17 advice, documented): the pin lives until the caller's
    // result is dropped and the ContextCleaner reclaims it — callers
    // that loop components() in one session should consume and release
    // each result; at cluster scale a corpus-sized edge relation
    // should run with spark.graft.pin.reliable=true (see
    // [[graft.config.Pin]]) so the pin is also executor-loss-safe.
    val e0 = edges.select(col("src"), col("dst")).pin()
    val ids = e0.select(col("src").as("id"))
      .union(e0.select(col("dst").as("id"))).distinct()
    Dedup.survivorsFromPairsStar(ids,
        e0.select(col("src").as("a"), col("dst").as("b")))
      .select(col("id").as("node"), col("survivor_id").as("component"))
  }

  /** Deterministic fixed-point PageRank over a weighted edge relation
    * `(src, dst, w)`: damping `dampNum/dampDen` (default 17/20 = 0.85),
    * `iters` Jacobi iterations from a uniform start, all arithmetic
    * exact int64 over `scale` rank units —
    * `pr'(v) = (scale·(den−num)) ÷ (den·N) + (num · Σ_{u→v} (pr(u)·w ÷ W_u)) ÷ num_den`
    * with floor division at every step, so the result is bit-identical
    * across engines, partitionings and aggregation orders (each division
    * leaks < 1 unit of mass — PageRank is consumed as a RANKING signal,
    * not a probability). Dangling nodes keep only the teleport term (the
    * classic sink-drop variant — deterministic, and their outflow is by
    * definition unobserved in a transition log).
    *
    * Overflow contract: `max(pr)·max(w) < 2^63`; since Σpr ≤ scale this
    * holds whenever `scale · max_edge_weight < 9.2e18` — at the default
    * 1e12 scale that allows edge weights to ~9e6. For graphs with hotter
    * edges pass a smaller `scale` (rank precision degrades gracefully:
    * it only quantizes the teleport/contribution units).
    *
    * Scale shape: `N` is one count over the (aggregated, node-bounded)
    * node set; each iteration is a join of the tiny rank relation
    * against the edge relation + a map-side-combined sum — kilobytes of
    * exchange per iteration regardless of original corpus size. */
  def pageRank(edges: DataFrame, iters: Int = 5,
      dampNum: Long = 17L, dampDen: Long = 20L,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 0 && dampDen > dampNum && dampNum > 0)
    val (e0, nodes) = materializeGraph(edges)
    val n = nodes.count()
    require(n > 0, "empty graph")
    val teleport = (scale * (dampDen - dampNum)) / (dampDen * n)
    iterate(e0, nodes, lit(teleport), lit(scale / n), iters,
      dampNum, dampDen)
  }

  /** Materialize the aggregated graph ONCE before iterating: the edge
    * relation usually hides a corpus-scale extraction (a window over the
    * raw log), and a lazy plan would re-run it every iteration —
    * measured 5x the extraction cost at iters=5. Iterating over the
    * checkpointed node²-bounded relation is the GraphX-shaped contract. */
  private def materializeGraph(edges: DataFrame)
      : (DataFrame, DataFrame) = {
    val e0 = edges.select(col("src"), col("dst"), col("w"))
      .pin()
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct()
      .pin()
    (e0, nodes)
  }

  /** The shared Jacobi loop: `pr'(v) = teleport(v) +
    * (num·Σ (pr(u)·w ÷ W_u)) ÷ den` — `teleportCol`/`pr0` may reference
    * `node`, which is how the personalized variant scopes its mass.
    *
    * Round 18 (§2.4 — remove shuffles): each iteration used to be
    * `groupBy(node) + nodes LEFT JOIN contrib` — two node-keyed
    * exchanges plus a join operator per iteration. Dangling-safe
    * coverage of every node is instead obtained by UNIONING a zero
    * contribution row per node into the aggregate: one exchange per
    * iteration, no join, and `sum` over the union equals
    * `coalesce(cs, 0)` exactly (exact int64 addition of a 0 term).
    * Measured: graph_pagerank 1.27 → 1.12 s, graph_pagerank_seeded
    * 1.29 → 1.13 s (min-of-3 at sf0.1/32 cores), and at cluster scale
    * one fewer shuffle of the node-sized rank relation per iteration. */
  private def iterate(e0: DataFrame, nodes: DataFrame,
      teleportCol: Column, pr0: Column, iters: Int,
      dampNum: Long, dampDen: Long): DataFrame = {
    val outW = e0.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    val e = e0.join(outW, "src")
    var pr = nodes.select(col("node"), pr0.as("pr"))
    (0 until iters).foreach { _ =>
      val contrib = e
        .join(pr.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          TF.intDivNonNeg(col("pr") * col("w"), col("wout")).as("c"))
      pr = contrib
        .unionAll(nodes.select(col("node"), lit(0L).as("c")))
        .groupBy(col("node")).agg(sum(col("c")).as("cs"))
        .select(col("node"),
          (teleportCol +
            TF.intDivNonNeg(lit(dampNum) * col("cs"),
              lit(dampDen))).as("pr"))
    }
    pr.orderBy(col("node"))
  }

  /** PERSONALIZED (topic-sensitive) PageRank: identical arithmetic to
    * [[pageRank]] but the teleport mass lands ONLY on the `seeds` —
    * authority RELATIVE to a trusted set (the curation shape: seed with
    * hand-vetted quality domains, harvest what they flow authority to;
    * Haveliwala, WWW 2002). Start vector is uniform over the seeds;
    * per-iteration teleport is `(scale·(den−num)) ÷ (den·|seeds|)` at
    * seed nodes and 0 elsewhere. Same floor-division determinism, same
    * aggregated-relation iteration cost. Seeds absent from the graph
    * still count in |seeds| (their teleport share is simply unobserved)
    * — deterministic and honest about an incomplete seed list. */
  def personalizedPageRank(edges: DataFrame, seeds: Seq[Long],
      iters: Int = 5, dampNum: Long = 17L, dampDen: Long = 20L,
      scale: Long = 1000000000000L): DataFrame = {
    require(seeds.nonEmpty, "personalized PageRank needs seed nodes")
    require(iters >= 0 && dampDen > dampNum && dampNum > 0)
    val seedSet = seeds.distinct
    val k = seedSet.length.toLong
    val (e0, nodes) = materializeGraph(edges)
    val isSeed = col("node").isin(seedSet: _*)
    val teleport = (scale * (dampDen - dampNum)) / (dampDen * k)
    iterate(e0, nodes,
      when(isSeed, lit(teleport)).otherwise(lit(0L)),
      when(isSeed, lit(scale / k)).otherwise(lit(0L)),
      iters, dampNum, dampDen)
  }
}
