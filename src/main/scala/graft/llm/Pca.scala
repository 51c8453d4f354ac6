package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}

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
  * hundred the keyed aggregation is the simpler equivalent). The
  * per-dim mean sums ride the SAME aggregation (the k = 0 groups),
  * so mean + Gram cost one pass, not two.
  *
  * The D²-long Gram/mean sums are a MODEL (the PqIndex/Bpe eager-
  * collect discipline): they are collected to the driver, and the
  * power iteration — 3 rounds of a D×D mat-vec — runs as plain driver
  * arithmetic instead of 3 rounds of join + aggregate + collect_list
  * stage waves over a dim²-row frame (r17 profile: the frame-resident
  * iteration cost ~15 serialized sub-100 ms jobs; corpus size never
  * touched it). Corpus-sized work stays distributed; only the
  * dim-bounded fold moved.
  *
  * Determinism ([[GraphOps.pageRank]] discipline): every cross-row
  * sum is an INTEGER sum of floor-quantized terms (means 10⁻⁶, Gram
  * 10⁻⁹, matrix-vector products 10⁻¹²) — integer sums are order-
  * independent, so the driver fold is bit-identical to the former
  * frame fold in any engine at any parallelism; the only sequential
  * float folds (vector norm via [[Similarity.dot]]) run left-to-right
  * identically here, in codegen, and in the oracle.
  */
object Pca {

  /** Collected model-sized Gram statistics: row count `n`, per-dim
    * quantized mean sums sq_j = Σ floor(x_j·10⁶), and quantized Gram
    * sums gq_{j,k} = Σ floor(x_j·x_k·10⁹) — exact integers, keyed by
    * the (j, k) groups that actually occurred. A `None` value is a
    * SQL NULL sum (every contributing element was NULL).
    */
  private[llm] final case class GramStats(
      n: Long,
      sq: Map[Int, Option[Long]],
      gq: Map[(Int, Int), Option[Long]])

  /** One exploded aggregation pass over the corpus (plus a column-
    * pruned count job): emits the same integer aggregates the mean
    * and Gram frames used to carry. sq_j rides the (j, 0) groups —
    * arrays explode to contiguous positions, so a row contributes to
    * (j, 0) exactly iff it contributes to the old per-j mean group.
    */
  private[llm] def gramStats(df: DataFrame, vec: Column): GramStats = {
    val pts = df.select(transform(vec, x => x.cast("double")).as("v"))
    val n = pts.agg(count(lit(1))).head().getLong(0)
    val rows = pts
      .select(col("v"), posexplode(col("v")).as(Seq("j", "x")))
      .select(col("j"), col("x").as("xj"),
        posexplode(col("v")).as(Seq("k", "xk")))
      .groupBy(col("j"), col("k"))
      .agg(sum(floor(col("xj") * col("xk") * lit(1e9d)).cast("long")).as("gq"),
        sum(when(col("k") === 0, floor(col("xj") * lit(1e6d)).cast("long"))).as("sqj"))
      .collect()
    def optLong(r: Row, i: Int): Option[Long] =
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    val gq = rows.map(r => (r.getInt(0), r.getInt(1)) -> optLong(r, 2)).toMap
    val sq = rows.filter(_.getInt(1) == 0)
      .map(r => r.getInt(0) -> optLong(r, 3)).toMap
    GramStats(n, sq, gq)
  }

  /** The quantized power iteration as driver arithmetic — term-exact
    * replica of the former frame pipeline: cov c_{j,k} = gq/10⁹/n −
    * (sq_j/10⁶/n)·(sq_k/10⁶/n) over the (j,k) groups whose j and k
    * both have a mean group (the former inner joins); each round
    * y_j = Σ_k floor(c_{j,k}·x_k·10¹²) as a Long sum skipping NULL
    * terms (SQL sum semantics: all-NULL ⇒ NULL, no terms ⇒ no group);
    * ya sorts ascending j, the norm is the left-to-right
    * [[Similarity.dot]] fold (NULL elements read as 0, matching
    * ArrayData), and the next iterate re-keys by array POSITION
    * (the former posexplode). Returns (position, loading) ascending.
    */
  private[llm] def powerIterate(gs: GramStats, iters: Int): IndexedSeq[(Int, Option[Double])] = {
    val nD = gs.n.toDouble
    // c is None when the gq sum or either mean sum is SQL NULL — the
    // former float expression propagated NULL through the arithmetic
    val cov: Map[(Int, Int), Option[Double]] = gs.gq.collect {
      case ((j, k), gqv) if gs.sq.contains(j) && gs.sq.contains(k) =>
        (j, k) -> (for (g <- gqv; a <- gs.sq(j); b <- gs.sq(k)) yield
          g.toDouble / 1e9d / nD -
            (a.toDouble / 1e6d / nD) * (b.toDouble / 1e6d / nD))
    }
    var x: Map[Int, Option[Double]] = gs.sq.keysIterator.map(_ -> Option(1.0d)).toMap
    var out: IndexedSeq[(Int, Option[Double])] =
      x.keys.toIndexedSeq.sorted.map(k => k -> x(k))
    for (_ <- 1 to iters) {
      // yq: Long sum of floor(c·xv·1e12) per j over the joined (j,k)
      // pairs; SQL-sum semantics via Option
      val terms = cov.toSeq.collect {
        case ((j, k), c) if x.contains(k) =>
          j -> (for (cv <- c; xv <- x(k)) yield math.floor(cv * xv * 1e12d).toLong)
      }
      val yq: Map[Int, Option[Long]] = terms.groupBy(_._1).map { case (j, ts) =>
        val defined = ts.flatMap(_._2)
        j -> (if (defined.isEmpty) None else Some(defined.sum))
      }
      val ya: IndexedSeq[Option[Double]] = yq.keys.toIndexedSeq.sorted
        .map(j => yq(j).map(_.toDouble / 1e12d))
      // norm: the Similarity.dot left-to-right fold; a NULL element
      // reads as 0 (ArrayData.getDouble on a null slot)
      var acc = 0.0d
      ya.foreach { o => val v = o.getOrElse(0.0d); acc += v * v }
      val nrm = math.sqrt(acc)
      val next = ya.map(_.map(_ / nrm))
      x = next.indices.map(i => i -> next(i)).toMap
      out = next.indices.map(i => i -> next(i))
    }
    out
  }

  /** (dim, loading) of the top principal component after `iters`
    * power iterations from the all-ones start vector, unit-norm.
    */
  def topComponent(df: DataFrame, vec: Column, iters: Int): DataFrame = {
    val spark = df.sparkSession
    val x = powerIterate(gramStats(df, vec), iters)
    val schema = StructType(Seq(
      StructField("dim", IntegerType, nullable = false),
      StructField("loading", DoubleType, nullable = true)))
    val data = new java.util.ArrayList[Row](x.length)
    x.foreach { case (k, v) => data.add(Row(k, v.orNull)) }
    spark.createDataFrame(data, schema).orderBy(col("dim"))
  }

  /** The loadings/means as a literal array column — NULL-preserving,
    * typed array<double> even when empty.
    */
  private def litArray(xs: Seq[Option[Double]]): Column =
    if (xs.isEmpty) lit(Array.empty[Double])
    else array(xs.map {
      case Some(d) => lit(d)
      case None => lit(null).cast("double")
    }: _*)

  /** All-but-the-top post-processing (Mu & Viswanath ICLR'18, D = 1):
    * w = (v − μ) − ⟨v − μ, u⟩·u with u = [[topComponent]] — remove
    * the common mean and the dominant direction so cosine similarity
    * measures CONTENT, not the corpus-wide bias every embedding
    * shares. Returns (id, w).
    *
    * Scale: μ and u are dim-bounded driver arrays embedded as
    * literals in ONE pure map pass — the corpus is scanned once for
    * the fused mean+Gram aggregation and once for the projection
    * (the former shape paid a third scan for the separate mean pass
    * and pinned a corpus-sized localCheckpoint for the Gram/mean
    * branches).
    */
  def abtt(df: DataFrame, id: Column, vec: Column, iters: Int): DataFrame = {
    val gs = gramStats(df, vec)
    val u = litArray(powerIterate(gs, iters).map(_._2))
    val mu = litArray(gs.sq.toSeq.sortBy(_._1).map { case (_, s) =>
      s.map(_.toDouble / 1e6d / gs.n.toDouble)
    })
    df.select(id.as("id"), transform(vec, x => x.cast("double")).as("v"))
      .select(col("id"), {
        val c = zip_with(col("v"), mu, (a, b) => a - b)
        val dot = Similarity.dot(c, u)
        zip_with(c, u, (cj, uj) => cj - dot * uj).as("w")
      })
  }
}
