package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over pair lists — the centrality
  * counterpart of [[Dedup.components]]' connectivity: which documents
  * sit at the CENTER of a duplication/similarity neighborhood (their
  * text radiated furthest — boilerplate hubs, canonical sources), vs
  * leaf-like one-off copies. A curation pass keeps hubs and drops
  * leaves, or weights quality review by centrality.
  */
object GraphOps {

  /** Fixed-iteration PageRank (Page, Brin, Motwani & Winograd 1999;
    * damping d = 0.85) over an UNDIRECTED pair list — edges are
    * symmetrized, so every node has degree ≥ 1 and there is no
    * dangling mass to redistribute.
    *
    * Determinism ([[NgramLm]] discipline at graph scale): each edge's
    * contribution rank(src)/deg(src) is quantized to integer
    * pico-units (floor(·10¹²)) BEFORE the dst-keyed sum, so the only
    * cross-row aggregation is order-free integer addition and every
    * iteration's rank vector is bit-identical in any engine. The
    * floor leaks < |E|·10⁻¹² rank mass per iteration — deterministic,
    * and 6 orders below the r4 output rounding.
    *
    * Scale: per iteration, one edges⋈ranks equi-join on src + one
    * dst-keyed map-side-combined sum — the [[Dedup.components]] cost
    * class (one job per round, shuffle keyed on node id, nothing
    * pairwise beyond the given edges). The rank frame (|V| rows) is
    * localCheckpoint'd per iteration so plan lineage stays bounded at
    * any iteration count.
    *
    * Returns (id, deg, rank) for every node that appears in an edge.
    */
  def pageRank(pairs: DataFrame, a: Column, b: Column, iters: Int,
               d: Double = 0.85d): DataFrame = {
    val e0 = pairs.select(a.cast("long").as("src"), b.cast("long").as("dst"))
    val edges = e0
      .unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(false)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(false)
    val n = deg.agg(count(lit(1)).as("n"))
    var ranks = deg.select(col("src").as("id"))
      .crossJoin(broadcast(n))
      .select(col("id"), (lit(1.0d) / col("n").cast("double")).as("rank"))
      .localCheckpoint(false)
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(deg, Seq("src"))
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"),
          floor(col("rank") / col("deg").cast("double") * lit(1e12d))
            .cast("long").as("q"))
        .groupBy(col("dst")).agg(sum(col("q")).as("sq"))
      ranks = deg.select(col("src").as("id"))
        .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .crossJoin(broadcast(n))
        .select(col("id"),
          (lit(1.0d - d) / col("n").cast("double") +
            lit(d) * (coalesce(col("sq"), lit(0L)).cast("double") / lit(1e12d)))
            .as("rank"))
        .localCheckpoint(false)
    }
    deg.select(col("src").as("id"), col("deg")).join(ranks, Seq("id"))
  }

  /** Fixed-iteration HITS (Kleinberg, "Authoritative Sources in a
    * Hyperlinked Environment", JACM 1999) over a DIRECTED edge list:
    * authority(v) = Σ hub(u) over in-edges u→v, hub(u) = Σ
    * authority(v) over out-edges, alternating, each vector
    * L1-normalized per half-step. On a near-dup graph oriented
    * later→earlier ("copied from"), authorities are canonical source
    * documents and hubs are prolific re-packagers — the curation
    * signal PageRank's undirected rank blurs.
    *
    * Determinism (the [[pageRank]] discipline): every contribution is
    * floor-quantized to integer pico-units before the keyed sum, and
    * the L1 normalizer is itself the integer sum of those quanta, so
    * each half-step's vector is one exact-integer ratio per node —
    * bit-identical in any engine. Scale: per half-step, one
    * edges⋈scores equi-join + one keyed integer sum; score frames
    * (|V| rows) are localCheckpoint'd per iteration to bound lineage.
    *
    * Returns (id, out_deg, in_deg, hub, auth) for every node in the
    * edge list; nodes without out-edges carry hub 0, without
    * in-edges auth 0.
    */
  def hits(pairs: DataFrame, srcC: Column, dstC: Column,
           iters: Int): DataFrame = {
    val edges = pairs
      .select(srcC.cast("long").as("src"), dstC.cast("long").as("dst"))
      .distinct().localCheckpoint(false)
    val nodes = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("_d")).drop("_d")
      .localCheckpoint(false)
    var hub = nodes.withColumn("h", lit(1.0d))
    var auth = nodes.withColumn("a", lit(1.0d))
    for (_ <- 1 to iters) {
      val aq = edges
        .join(hub.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"),
          floor(col("h") * lit(1e12d)).cast("long").as("q"))
        .groupBy(col("dst")).agg(sum(col("q")).as("sq"))
        .localCheckpoint(false)
      val asum = aq.agg(sum(col("sq")).as("s"))
      auth = nodes
        .join(aq.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .crossJoin(broadcast(asum))
        .select(col("id"),
          (coalesce(col("sq"), lit(0L)).cast("double")
            / col("s").cast("double")).as("a"))
        .localCheckpoint(false)
      val hq = edges
        .join(auth.withColumnRenamed("id", "dst"), Seq("dst"))
        .select(col("src"),
          floor(col("a") * lit(1e12d)).cast("long").as("q"))
        .groupBy(col("src")).agg(sum(col("q")).as("sq"))
        .localCheckpoint(false)
      val hsum = hq.agg(sum(col("sq")).as("s"))
      hub = nodes
        .join(hq.withColumnRenamed("src", "id"), Seq("id"), "left")
        .crossJoin(broadcast(hsum))
        .select(col("id"),
          (coalesce(col("sq"), lit(0L)).cast("double")
            / col("s").cast("double")).as("h"))
        .localCheckpoint(false)
    }
    val outDeg = edges.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("out_deg"))
    val inDeg = edges.groupBy(col("dst").as("id"))
      .agg(count(lit(1)).as("in_deg"))
    nodes
      .join(outDeg, Seq("id"), "left")
      .join(inDeg, Seq("id"), "left")
      .join(hub, Seq("id"))
      .join(auth, Seq("id"))
      .select(col("id"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        col("h"), col("a"))
  }

  /** Fixed-round semi-supervised label propagation (Zhu & Ghahramani
    * 2002, the hard-label form; community flavor is Raghavan et al.
    * 2007) over an UNDIRECTED pair list: seed nodes keep their labels
    * forever; every other node takes, each synchronous round, the
    * MAJORITY label among its currently-labeled neighbors with the
    * deterministic (count desc, label asc) tie-break. The
    * training-data use: densify weak labels (language, source,
    * quality tier) through duplicate clusters — a near-copy of a
    * labeled document inherits its label without a model.
    *
    * Determinism: label choice is an integer count argmax with a
    * total tie order — no floats anywhere. Scale: per round, one
    * edges⋈labels equi-join, one (node,label) count, one per-node
    * top-1 (WindowGroupLimit-able); label frames localCheckpoint'd
    * per round so lineage stays bounded.
    *
    * Returns (id, label, is_seed) for every node in the edge list;
    * label is null for nodes no labeled neighbor ever reached.
    */
  def labelPropagate(pairs: DataFrame, a: Column, b: Column,
                     seeds: DataFrame, seedId: Column, seedLabel: Column,
                     rounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e0 = pairs.select(a.cast("long").as("x"), b.cast("long").as("y"))
    val edges = e0
      .unionByName(e0.select(col("y").as("x"), col("x").as("y")))
      .distinct().localCheckpoint(false)
    val nodes = edges.select(col("x").as("id")).distinct()
      .localCheckpoint(false)
    // seeds restricted to graph nodes: off-graph labels can't spread
    val seedsDf = seeds
      .select(seedId.cast("long").as("id"), seedLabel.as("label"))
      .join(nodes, Seq("id"), "left_semi")
      .localCheckpoint(false)
    var labels = seedsDf
    for (_ <- 1 to rounds) {
      val nbr = edges
        .join(labels.withColumnRenamed("id", "x"), Seq("x"))
        .groupBy(col("y").as("id"), col("label"))
        .agg(count(lit(1)).as("c"))
      val top = Window.partitionBy(col("id"))
        .orderBy(col("c").desc, col("label").asc)
      val mode = nbr.withColumn("rn", row_number().over(top))
        .filter(col("rn") === 1).select(col("id"), col("label"))
      labels = seedsDf
        .unionByName(mode.join(seedsDf, Seq("id"), "left_anti"))
        .localCheckpoint(false)
    }
    nodes
      .join(labels, Seq("id"), "left")
      .join(seedsDf.select(col("id"), lit(true).as("is_seed")),
        Seq("id"), "left")
      .select(col("id"), col("label"),
        coalesce(col("is_seed"), lit(false)).as("is_seed"))
  }

  /** Exact triangle count + global clustering coefficient over an
    * undirected unique pair list (id_a < id_b) — the degree-oriented
    * node-iterator (Schank & Wagner 2005; the MapReduce form is Suri &
    * Vassilvitskii WWW'11): orient every edge from the lower
    * (degree, id) endpoint to the higher, build length-2 paths by
    * self-joining oriented edges on their source, and close each
    * wedge against the oriented edge set. Orientation bounds each
    * join key's fan-out by O(√m), so wedge generation is O(m^1.5)
    * worst-case instead of Σdeg² — the property that makes the
    * count feasible on power-law duplicate graphs at corpus scale.
    *
    * Returns one row: n_nodes, n_edges, n_triangles, n_wedges
    * (Σ deg(deg−1)/2 — candidate closed pairs), and the global
    * clustering coefficient 3·T / wedges (0 when wedge-free). All
    * counts exact integers; the coefficient is the single division.
    */
  def triangleStats(pairs: DataFrame, a: Column, b: Column): DataFrame = {
    val e = pairs.select(a.as("x"), b.as("y")).filter(col("x") < col("y"))
      .distinct()
      .localCheckpoint(false)
    val deg = e.select(col("x").as("id"))
      .unionAll(e.select(col("y").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(deg.select(col("id").as("x"), col("deg").as("dx")), "x")
      .join(deg.select(col("id").as("y"), col("deg").as("dy")), "y")
    // orient low (deg, id) → high (deg, id); ties impossible on id
    val oriented = withDeg.select(
      when(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")),
        struct(col("x").as("src"), col("y").as("dst")))
        .otherwise(struct(col("y").as("src"), col("x").as("dst"))).as("e"))
      .select(col("e.src"), col("e.dst"))
      .localCheckpoint(false)
    val wedges = oriented.select(col("src"), col("dst").as("d1"))
      .join(oriented.select(col("src"), col("dst").as("d2")), "src")
      .filter(col("d1") < col("d2"))
    // a wedge (src; d1, d2) closes iff the oriented edge set contains
    // d1→d2 or d2→d1; oriented edges are unique, so a LEFT SEMI on the
    // canonical (min, max) undirected key counts each triangle ONCE
    // (each triangle has exactly one wedge rooted at its lowest-rank
    // vertex under the orientation)
    val undirectedKey = e.select(col("x").as("d1"), col("y").as("d2"))
    val triangles = wedges.join(undirectedKey, Seq("d1", "d2"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val nodes = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
    val edges = e.agg(count(lit(1)).as("n_edges"))
    nodes.crossJoin(edges).crossJoin(triangles)
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        col("n_wedges"),
        when(col("n_wedges") > 0L,
          lit(3L) * col("n_triangles").cast("double")
            / col("n_wedges").cast("double")).otherwise(lit(0.0d)).as("gcc"))
  }
}
