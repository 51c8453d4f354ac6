package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index — the build-once / probe-many lifecycle of
  * [[Similarity.ivfPqTopK]] (which fits and scans in one job, the
  * oracle-checkable form). A 100 TB ANN deployment amortizes the
  * expensive parts: codebooks and coarse centroids are fit once;
  * per-vector codes land in parquet PARTITIONED BY cell, so a probe
  * is partition pruning (only nprobe directories are ever listed or
  * read) over rows of M small ints + one norm — the raw vectors stay
  * in the base table and are fetched only for the `rerank` survivors.
  *
  * Layout under `dir`:
  * {{{
  *   codes/cell=<c>/…   (id, nv, codes array<int> ordered by m)
  *   codebook/          (m, code, centroid)   — M·ksub·dsub doubles
  *   cents/             (cell, centroid)      — coarse centroids
  * }}}
  *
  * Query-side math runs on the DRIVER over the collected codebook
  * (M·ksub dots — microseconds), shipped into the scan as literal
  * arrays: the per-row ADC score is a fold over the row's own M
  * codes, no join at all on the probed path. Scoring folds ascending
  * m like the one-shot form, so both produce identical candidates.
  */
object PqIndex {

  final case class Params(mSub: Int = 8, dim: Int = 64, ksub: Int = 16,
                          iters: Int = 3)

  /** Fit coarse+PQ structure on `df` and write the index. Vectors are
    * NOT copied into the index — rerank reads them from the caller's
    * base table. At 100 TB fit on a [[Sampling.hashSample]] subset
    * and [[Similarity.pqAssign]] streams the full corpus once.
    */
  def build(df: DataFrame, id: Column, cell: Column, vec: Column,
            dir: String, params: Params = Params()): Unit = {
    val pts = df.select(id.cast("long").as("id"), cell.as("cell"),
        transform(vec, x => x.cast("double")).as("v"))
      .withColumn("nv", Similarity.l2Norm(col("v")))
    val cents = Similarity.centroids(pts, col("cell"), col("v"))
    val resid = pts.join(broadcast(cents), "cell")
      .select(col("id"), col("cell"),
        zip_with(col("v"), col("centroid"), (a, b) => a - b).as("r"))
    val sub = Similarity.subVectors(resid, col("r"), params.mSub, params.dim)
      .select(col("id"), col("cell"), col("m"), col("subv"))
    val cb = Similarity.pqFit(sub, params.ksub, params.iters)
    val codes = Similarity.pqAssign(sub, cb)
      .groupBy(col("id"), col("cell"))
      .agg(array_sort(collect_list(struct(col("m"), col("code")))).as("mc"))
      .select(col("id"), col("cell"),
        transform(col("mc"), x => x.getField("code").cast("int")).as("codes"))
    codes.join(pts.select(col("id"), col("nv")), "id")
      .write.partitionBy("cell").mode("overwrite").parquet(s"$dir/codes")
    cb.write.mode("overwrite").parquet(s"$dir/codebook")
    cents.write.mode("overwrite").parquet(s"$dir/cents")
  }

  /** Top-k by ADC + exact rerank against a stored index. `base` must
    * hold the original vectors as (idCol, vecCol); only the `rerank`
    * surviving ids are joined back to it (point lookups at scale).
    */
  def topK(spark: SparkSession, dir: String, base: DataFrame,
           id: Column, vec: Column, q: Seq[Double], k: Int, nprobe: Int,
           rerank: Int, params: Params = Params()): DataFrame = {
    val dsub = params.dim / params.mSub
    // driver-side query prep: tiny frames, exact same arithmetic as
    // the one-shot path (ascending-index dot folds)
    def dot(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0d; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val nq = math.sqrt(dot(q, q))
    val cents = spark.read.parquet(s"$dir/cents").collect()
      .map(r => (r.getAs[Any]("cell"), r.getSeq[Double](r.fieldIndex("centroid"))))
    val cb = spark.read.parquet(s"$dir/codebook").collect()
      .map(r => (r.getAs[Number]("m").intValue(), r.getAs[Number]("code").intValue(),
        r.getSeq[Double](r.fieldIndex("centroid"))))
    // probed cells by centroid cosine; the tiebreak must order like
    // the one-shot path's `col("cell").asc` — numeric for numeric
    // cells (a bare toString would put "10" before "2")
    def cellKey(c: Any): String = c match {
      case n: Number => f"${n.longValue()}%020d"
      case other     => String.valueOf(other)
    }
    val probed = cents.map { case (c, cent) =>
      (c, dot(cent, q), dot(cent, q) / (math.sqrt(dot(cent, cent)) * nq))
    }.sortBy { case (c, _, csim) => (-csim, cellKey(c)) }.take(nprobe)
    val cellConst = probed.map { case (c, cip, _) => (c.toString, cip) }.toMap
    // ADC table as one literal array indexed m*ksub + code
    val tab = Array.ofDim[Double](params.mSub * params.ksub)
    cb.foreach { case (m, code, cent) =>
      tab(m * params.ksub + code) = dot(cent, q.slice(m * dsub, (m + 1) * dsub))
    }
    val tabCol = array(tab.map(lit): _*)
    val qCol = array(q.map(lit): _*)
    val codes = spark.read.parquet(s"$dir/codes")
      .filter(col("cell").isin(probed.map(_._1): _*)) // partition pruning
    val cipCol = probed.tail.foldLeft(
      when(col("cell").cast("string") === probed.head._1.toString, lit(probed.head._2))) {
      case (acc, (cl, cip, _)) => acc.when(col("cell").cast("string") === cl.toString, lit(cip))
    }
    val ksub = params.ksub
    val rip = aggregate(
      zip_with(col("codes"), sequence(lit(0), lit(params.mSub - 1)),
        (c, m) => element_at(tabCol, (m * ksub + c + 1).cast("int"))),
      lit(0.0d), (acc, x) => acc + x)
    val cand = codes
      .select(col("id"), col("cell").as("picked_cell"),
        ((cipCol + rip) / (col("nv") * nq)).as("approx"))
      .orderBy(col("approx").desc, col("id").asc)
      .limit(rerank)
    // exact rerank: fetch raw vectors for survivors only
    cand.join(base.select(id.cast("long").as("id"),
        transform(vec, x => x.cast("double")).as("v")), "id")
      .select(col("id"), col("picked_cell"),
        Similarity.cosine(col("v"), qCol).as("sim"))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)
  }
}
