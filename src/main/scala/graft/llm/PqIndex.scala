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
  *   params/            (m_sub, dim, ksub)    — build geometry; topK
  *                      validates its Params against this and errors
  *                      on mismatch (a wrong geometry would silently
  *                      mis-index the ADC table otherwise)
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

  /** The driver-side artifacts a query needs, collected once per `dir`
    * on the probe-many hot path: geometry, coarse centroids, codebook.
    * All three are bounded (1 row, ncells, M·ksub) — caching them adds
    * no peak memory beyond what a single topK already collects.
    */
  private final case class Meta(params: Params,
                                cents: Array[(Any, Seq[Double])],
                                cb: Array[(Int, Int, Seq[Double])])

  // keyed on the literal dir string; build() invalidates its own dir,
  // an out-of-process rebuild needs invalidate(dir) (documented there)
  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[String, Meta]()

  /** Drop the cached driver-side artifacts for `dir`. [[build]] calls
    * this itself; only needed directly when ANOTHER process rebuilt
    * the index at the same path under this one's feet.
    */
  def invalidate(dir: String): Unit = metaCache.remove(dir)

  private def meta(spark: SparkSession, dir: String): Meta =
    metaCache.computeIfAbsent(dir, { d =>
      val params = readParams(spark, d)
      val cents = spark.read.parquet(s"$d/cents").collect()
        .map(r => (r.getAs[Any]("cell"), r.getSeq[Double](r.fieldIndex("centroid"))))
      require(cents.nonEmpty, s"empty or missing index at $d/cents")
      val cb = spark.read.parquet(s"$d/codebook").collect()
        .map(r => (r.getAs[Number]("m").intValue(), r.getAs[Number]("code").intValue(),
          r.getSeq[Double](r.fieldIndex("centroid"))))
      Meta(params, cents, cb)
    })

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
    // the partition column is the CANONICAL STRING of the cell, and
    // topK reads it back with an explicit schema: Spark's partition-
    // column type inference would otherwise rewrite values on the
    // round-trip (cell "007" → directory cell=007 → read back as
    // integer 7) and silently unmatch them from the cents frame
    codes.join(pts.select(col("id"), col("nv")), "id")
      .withColumn("cell", col("cell").cast("string"))
      .write.partitionBy("cell").mode("overwrite").parquet(s"$dir/codes")
    cb.write.mode("overwrite").parquet(s"$dir/codebook")
    cents.write.mode("overwrite").parquet(s"$dir/cents")
    // persist the geometry the codes were quantized under: topK
    // re-derives dsub and the ADC table indexing from these, and a
    // caller passing a different Params would otherwise silently
    // mis-index tab (wrong neighbors, no error)
    val spark = df.sparkSession
    import spark.implicits._
    Seq((params.mSub, params.dim, params.ksub))
      .toDF("m_sub", "dim", "ksub")
      .write.mode("overwrite").parquet(s"$dir/params")
    invalidate(dir)
  }

  /** The [[Params]] an index at `dir` was built with; fails loudly on
    * a pre-params index rather than guessing.
    */
  def readParams(spark: SparkSession, dir: String): Params = {
    val r = spark.read.parquet(s"$dir/params").collect()
    require(r.length == 1, s"malformed index params at $dir/params")
    Params(mSub = r(0).getAs[Int]("m_sub"), dim = r(0).getAs[Int]("dim"),
      ksub = r(0).getAs[Int]("ksub"))
  }

  private val codesSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("codes",
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType)),
    org.apache.spark.sql.types.StructField("nv", org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("cell", org.apache.spark.sql.types.StringType)))

  /** Top-k by ADC + exact rerank against a stored index. `base` must
    * hold the original vectors as (idCol, vecCol); only the `rerank`
    * surviving ids are joined back to it (point lookups at scale).
    * `picked_cell` in the output carries the index's canonical STRING
    * form of the cell (what the partition directories are named).
    * The index's persisted geometry is authoritative — omit `params`
    * to use it directly, or pass it to have it validated.
    */
  def topK(spark: SparkSession, dir: String, base: DataFrame,
           id: Column, vec: Column, q: Seq[Double], k: Int, nprobe: Int,
           rerank: Int, params: Params = null): DataFrame = {
    // the on-disk geometry is authoritative: a caller-supplied Params
    // that disagrees with what build() wrote would mis-index the ADC
    // table (wrong tab slots, zip_with null-padding) and return wrong
    // neighbors with no error — so validate, don't trust; with no
    // caller Params the stored geometry simply drives the query.
    // The driver-side artifacts (params, cents, codebook) are cached
    // per dir: build-once / probe-many must not pay three collect jobs
    // per query
    val m = meta(spark, dir)
    val stored = m.params
    Option(params).foreach { p =>
      require(stored.mSub == p.mSub && stored.dim == p.dim &&
          stored.ksub == p.ksub,
        s"index at $dir was built with (mSub=${stored.mSub}, dim=${stored.dim}, " +
          s"ksub=${stored.ksub}) but topK was called with (mSub=${p.mSub}, " +
          s"dim=${p.dim}, ksub=${p.ksub})")
    }
    require(q.length == stored.dim,
      s"query vector has ${q.length} dims, index expects ${stored.dim}")
    val dsub = stored.dim / stored.mSub
    // driver-side query prep: tiny frames, exact same arithmetic as
    // the one-shot path (ascending-index dot folds)
    def dot(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0d; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val nq = math.sqrt(dot(q, q))
    val cents = m.cents
    val cb = m.cb
    // probed cells by centroid cosine; the csim tiebreak must order
    // like the one-shot path's `col("cell").asc`: NUMERICALLY for
    // numeric cells (a string sort misorders both "10" vs "2" and
    // every negative value), lexicographically otherwise
    val scored = cents.map { case (c, cent) =>
      (c, dot(cent, q), dot(cent, q) / (math.sqrt(dot(cent, cent)) * nq))
    }
    val probed = (scored.head._1 match {
      case _: Number =>
        scored.sortBy { case (c, _, csim) => (-csim, c.asInstanceOf[Number].longValue()) }
      case _ =>
        scored.sortBy { case (c, _, csim) => (-csim, String.valueOf(c)) }
    }).take(nprobe)
    // ADC table as one literal array indexed m*ksub + code
    val tab = Array.ofDim[Double](stored.mSub * stored.ksub)
    cb.foreach { case (m, code, cent) =>
      tab(m * stored.ksub + code) = dot(cent, q.slice(m * dsub, (m + 1) * dsub))
    }
    val tabCol = array(tab.map(lit): _*)
    val qCol = array(q.map(lit): _*)
    // explicit schema: the partition column stays the canonical STRING
    // build() wrote — no type inference, so the cents↔codes cell match
    // below cannot drift (see build)
    val codes = spark.read.schema(codesSchema).parquet(s"$dir/codes")
      .filter(col("cell").isin(probed.map(p => String.valueOf(p._1)): _*)) // partition pruning
    val cipCol = probed.tail.foldLeft(
      when(col("cell") === String.valueOf(probed.head._1), lit(probed.head._2))) {
      case (acc, (cl, cip, _)) => acc.when(col("cell") === String.valueOf(cl), lit(cip))
    }
    val ksub = stored.ksub
    val rip = aggregate(
      zip_with(col("codes"), sequence(lit(0), lit(stored.mSub - 1)),
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
