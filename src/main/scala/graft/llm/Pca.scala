package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Top principal component of an embedding corpus — the first step of
  * embedding post-processing pipelines (Mu & Viswanath, "All-but-the-
  * Top", ICLR'18: remove the mean and the top components to make
  * similarity scores discriminative; also the whitening/PCA step of
  * SemDeDup-style curation).
  *
  * Shape: ONE corpus pass accumulates the quantized Gram matrix —
  * a (j, k)-keyed aggregation with map-side combine, D² = dim² keys,
  * so the shuffle carries dim²·partitions rows regardless of corpus
  * size (at very large dim a treeAggregate of per-partition Gram
  * blocks becomes the better constant; at embedding dims ≤ a few
  * hundred the keyed aggregation is the simpler equivalent). Power
  * iteration then runs on the dim²-row covariance frame — corpus
  * size never touches the iteration.
  *
  * Determinism ([[GraphOps.pageRank]] discipline): every cross-row
  * sum is an INTEGER sum of floor-quantized terms (means 10⁻⁶, Gram
  * 10⁻⁹, matrix-vector products 10⁻¹²), so the covariance and every
  * iterate are bit-identical in any engine at any parallelism; the
  * only sequential float folds (vector norm via [[Similarity.dot]])
  * run left-to-right identically in both engines.
  */
object Pca {

  /** (dim, loading) of the top principal component after `iters`
    * power iterations from the all-ones start vector, unit-norm.
    */
  def topComponent(df: DataFrame, vec: Column, iters: Int): DataFrame = {
    val pts = df.select(transform(vec, x => x.cast("double")).as("v"))
      .localCheckpoint(false) // feeds the mean AND Gram branches
    val n = pts.agg(count(lit(1)).as("n"))
    val el = pts.select(col("v"), posexplode(col("v")).as(Seq("j", "x")))
    val mq = el.groupBy(col("j"))
      .agg(sum(floor(col("x") * lit(1e6d)).cast("long")).as("sq"))
    val el2 = el.select(col("j"), col("x").as("xj"),
      posexplode(col("v")).as(Seq("k", "xk")))
    val gq = el2.groupBy(col("j"), col("k"))
      .agg(sum(floor(col("xj") * col("xk") * lit(1e9d)).cast("long")).as("gq"))
    val cov = gq
      .join(mq.select(col("j"), col("sq").as("sqj")), Seq("j"))
      .join(mq.select(col("j").as("k"), col("sq").as("sqk")), Seq("k"))
      .crossJoin(broadcast(n))
      .select(col("j"), col("k"),
        (col("gq").cast("double") / lit(1e9d) / col("n").cast("double")
          - (col("sqj").cast("double") / lit(1e6d) / col("n").cast("double"))
            * (col("sqk").cast("double") / lit(1e6d) / col("n").cast("double")))
          .as("c"))
      .localCheckpoint(false) // dim² rows; every iteration re-reads it
    var x = mq.select(col("j").as("k"), lit(1.0d).as("xv"))
    for (_ <- 1 to iters) {
      val yq = cov.join(x, Seq("k"))
        .groupBy(col("j"))
        .agg(sum(floor(col("c") * col("xv") * lit(1e12d)).cast("long")).as("yq"))
      val ya = yq
        .agg(array_sort(collect_list(struct(col("j"),
          (col("yq").cast("double") / lit(1e12d)).as("yv")))).as("pa"))
        .select(transform(col("pa"), s => s.getField("yv")).as("ya"))
      x = ya
        .select(col("ya"), sqrt(Similarity.dot(col("ya"), col("ya"))).as("nrm"))
        .select(posexplode(transform(col("ya"), y => y / col("nrm")))
          .as(Seq("k", "xv")))
    }
    x.select(col("k").as("dim"), col("xv").as("loading")).orderBy(col("dim"))
  }

  /** Quantized per-dim means as a 1-row array frame (mu), the exact
    * mean form [[topComponent]]'s covariance uses — sq/10⁶/n.
    */
  private def meanArray(df: DataFrame, vec: Column): DataFrame = {
    val pts = df.select(transform(vec, x => x.cast("double")).as("v"))
    val n = pts.agg(count(lit(1)).as("n"))
    pts.select(posexplode(col("v")).as(Seq("j", "x")))
      .groupBy(col("j"))
      .agg(sum(floor(col("x") * lit(1e6d)).cast("long")).as("sq"))
      .crossJoin(broadcast(n))
      .agg(array_sort(collect_list(struct(col("j"),
        (col("sq").cast("double") / lit(1e6d) / col("n").cast("double"))
          .as("m")))).as("pa"))
      .select(transform(col("pa"), s => s.getField("m")).as("mu"))
  }

  /** All-but-the-top post-processing (Mu & Viswanath ICLR'18, D = 1):
    * w = (v − μ) − ⟨v − μ, u⟩·u with u = [[topComponent]] — remove
    * the common mean and the dominant direction so cosine similarity
    * measures CONTENT, not the corpus-wide bias every embedding
    * shares. Returns (id, w).
    *
    * Scale: μ and u are 1-row array frames broadcast into a pure map
    * pass — the corpus is scanned once for the Gram (inside
    * topComponent), once for the means, once for the projection.
    */
  def abtt(df: DataFrame, id: Column, vec: Column, iters: Int): DataFrame = {
    val uarr = topComponent(df, vec, iters)
      .agg(array_sort(collect_list(struct(col("dim"), col("loading")))).as("pa"))
      .select(transform(col("pa"), s => s.getField("loading")).as("u"))
    df.select(id.as("id"), transform(vec, x => x.cast("double")).as("v"))
      .crossJoin(broadcast(uarr))
      .crossJoin(broadcast(meanArray(df, vec)))
      .select(col("id"), {
        val c = zip_with(col("v"), col("mu"), (a, b) => a - b)
        val dot = Similarity.dot(c, col("u"))
        zip_with(c, col("u"), (cj, uj) => cj - dot * uj).as("w")
      })
  }
}
