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

  /** Per-partition partial of the fused mean+Gram pass: row count
    * (ALL rows, null vectors included — the former count semantics),
    * max vector size seen (group presence: a (j, k) group exists iff
    * some row has both positions, i.e. maxSize > max(j, k)), and the
    * quantized integer sums with has-value flags carrying SQL
    * NULL-sum semantics (a term is NULL iff either element is NULL;
    * an all-NULL group sums to NULL).
    */
  private final case class GramPartial(
      n: Long, maxSize: Int,
      sq: Array[Long], sqHas: Array[Boolean],
      gq: Array[Long], gqHas: Array[Boolean])

  /** One corpus pass for count + mean sums + Gram sums: a per-
    * partition D×D Long accumulation over the columnar rows (the
    * guide's per-partition-Gram-block form — ~dim² work per ROW in
    * the former posexplode² aggregation becomes dim² adds into a
    * local array, no 4096-key hash probing, no N·dim²-row Generate),
    * collected and merged on the driver. Integer sums commute, so the
    * result is term-exact to the exploded aggregation for every
    * (presence, NULL, ragged-size) case — replicated in the partial.
    */
  private[llm] def gramStats(df: DataFrame, vec: Column): GramStats = {
    val pts = df.select(transform(vec, x => x.cast("double")).as("v"))
    val partials = pts.queryExecution.toRdd.mapPartitions { it =>
      var n = 0L
      var maxSize = 0
      var sq: Array[Long] = Array.empty
      var sqHas: Array[Boolean] = Array.empty
      var gq: Array[Long] = Array.empty
      var gqHas: Array[Boolean] = Array.empty
      def grow(s: Int): Unit = if (s > maxSize) {
        val nsq = java.util.Arrays.copyOf(sq, s)
        val nsqH = java.util.Arrays.copyOf(sqHas, s)
        val ngq = new Array[Long](s * s)
        val ngqH = new Array[Boolean](s * s)
        var j = 0
        while (j < maxSize) {
          System.arraycopy(gq, j * maxSize, ngq, j * s, maxSize)
          System.arraycopy(gqHas, j * maxSize, ngqH, j * s, maxSize)
          j += 1
        }
        sq = nsq; sqHas = nsqH; gq = ngq; gqHas = ngqH; maxSize = s
      }
      while (it.hasNext) {
        val row = it.next()
        n += 1L
        if (!row.isNullAt(0)) {
          val v = row.getArray(0)
          val s = v.numElements()
          grow(s)
          var j = 0
          while (j < s) {
            if (!v.isNullAt(j)) {
              val xj = v.getDouble(j)
              sq(j) += math.floor(xj * 1e6d).toLong
              sqHas(j) = true
              var k = 0
              val base = j * maxSize
              while (k < s) {
                if (!v.isNullAt(k)) {
                  gq(base + k) += math.floor(xj * v.getDouble(k) * 1e9d).toLong
                  gqHas(base + k) = true
                }
                k += 1
              }
            }
            j += 1
          }
        }
      }
      Iterator.single(GramPartial(n, maxSize, sq, sqHas, gq, gqHas))
    }.collect()
    val n = partials.map(_.n).sum
    val d = if (partials.isEmpty) 0 else partials.map(_.maxSize).max
    def merged(idx: GramPartial => Int => (Long, Boolean), at: Int): Option[Long] = {
      var s = 0L
      var has = false
      partials.foreach { p =>
        val (v, h) = idx(p)(at)
        if (h) { has = true; s += v }
      }
      if (has) Some(s) else None
    }
    val sq = (0 until d).collect {
      case j if partials.exists(_.maxSize > j) =>
        j -> merged(p => i => if (j < p.maxSize) (p.sq(i), p.sqHas(i)) else (0L, false), j)
    }.toMap
    val gq = (for {
      j <- 0 until d
      k <- 0 until d
      if partials.exists(p => p.maxSize > j && p.maxSize > k)
    } yield (j, k) -> merged(p => _ =>
      if (j < p.maxSize && k < p.maxSize) (p.gq(j * p.maxSize + k), p.gqHas(j * p.maxSize + k))
      else (0L, false), 0)).toMap
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
