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
}
