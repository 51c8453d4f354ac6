package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over `array<float>` columns.
  *
  * Scale design: brute-force top-k is the correctness baseline (one
  * scan, a map-side partial top-k via the sort-limit pattern — Spark
  * turns orderBy+limit into TakeOrderedAndProject, no full sort). The
  * IVF variant prunes the scan to one partition (centroid cell),
  * which is the path that survives 100 TB: cells are just partition
  * keys, so a cell lookup is partition pruning, and only the probed
  * cell is read.
  *
  * All dot products fold left-to-right over doubles (float inputs are
  * exactly representable) — deterministic per row.
  */
object Similarity {

  /** Left-to-right dot product of two float-array columns in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Brute-force cosine top-k against the single query row selected by
    * `queryPred` (e.g. vec_id === 0). The query vector is broadcast
    * via crossJoin of a 1-row frame; the scan stays fully parallel.
    */
  def bruteForceTopK(df: DataFrame, id: Column, vec: Column,
                     queryPred: Column, k: Int): DataFrame = {
    val q = df.filter(queryPred).select(vec.as("qv")).limit(1)
    df.filter(!queryPred)
      .crossJoin(broadcast(q))
      .select(id.as("id"), cosine(vec, col("qv")).as("sim"))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)
  }

  /** Per-cell mean centroids from (cell, vec) — elementwise average
    * via posexplode + re-assemble (sorted by position).
    */
  def centroids(df: DataFrame, cell: Column, vec: Column): DataFrame =
    df.select(cell.as("cell"), posexplode(vec).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos"))
      .agg(avg(col("v").cast("double")).as("c"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("cell"), transform(col("pc"), x => x.getField("c")).as("centroid"))

  /** All-pairs cosine near-duplicate pairs (id_a < id_b, cosine ≥
    * threshold) via a broadcast right-hand matrix and a tight
    * mapPartitions dot-product loop. The declarative form (non-equi
    * join + higher-order-function dot) runs interpreted per pair and
    * measured ~25x slower at sf0.1; dense linear algebra is the one
    * place mapPartitions is the right tool (SURVEY §2.10 preference
    * order, option d). Accumulation is ascending-index, matching both
    * the fold-based [[dot]] and DuckDB's list_dot_product, so results
    * stay engine-exact.
    *
    * Scale: the broadcast side must fit an executor (~1 GB ≈ 2M
    * 64-dim doubles). Beyond that, block the pair space (outer loop
    * over broadcast-sized chunks of one side) — the streamed side
    * stays fully distributed either way.
    */
  def nearDupPairs(df: DataFrame, id: Column, vec: Column, threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df.select(id.cast("long").as("id"),
        transform(vec, x => x.cast("double")).as("v"))
      .withColumn("n", l2Norm(col("v")))
    val rows = prepared.collect().map { r =>
      (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2))
    }
    val bc = spark.sparkContext.broadcast(rows)
    // the streamed side is re-parallelized from the already-collected
    // rows, so the input plan (scan + cast + norm) executes exactly
    // once; the broadcast holds primitive arrays, not boxed Rows
    spark.createDataset(rows.toSeq)
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        val right = bc.value
        it.flatMap { case (ida, va, na) =>
          right.iterator
            .filter(_._1 > ida)
            .map { case (idb, vb, nb) =>
              var s = 0.0d
              var i = 0
              while (i < va.length) { s += va(i) * vb(i); i += 1 }
              (ida, idb, s / (na * nb))
            }
            .filter(_._3 >= threshold)
        }
      }
      .toDF("id_a", "id_b", "c")
  }

  /** Deterministic distributed k-means (Lloyd's): initial centroids
    * are the vectors of the k smallest ids; each iteration is one
    * assign (crossJoin with broadcast centroids + min_by) and one
    * mean-recompute — all shuffles keyed, centroids tiny (k × dim).
    * Ties in assignment break by cell id, so runs are reproducible.
    * This gives IVF real data-driven cells (the `label` column in the
    * testdata is not a cluster structure — measured recall 1/5; with
    * k-means cells the probed cell holds the true neighbors).
    */
  def kMeansFit(df: DataFrame, id: Column, vec: Column, k: Int, iters: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pts = df.select(id.as("id"), vec.as("v"))
    // Centroids are tiny (k x dim): materialize them to the driver
    // every iteration and rebuild a literal DataFrame. Without this,
    // iteration i's plan nests all prior iterations' crossJoins and
    // every downstream action re-runs the whole Lloyd chain.
    def toLocal(cents: DataFrame): Seq[(Int, Seq[Double])] =
      cents.collect().map(r =>
        (r.getAs[Number]("cell").intValue(), r.getSeq[Double](1))).toSeq
    def toDF(local: Seq[(Int, Seq[Double])]): DataFrame =
      local.toDF("cell", "centroid")
    var local = toLocal(
      pts.orderBy(col("id")).limit(k)
        .select((row_number().over(Window.orderBy(col("id"))) - 1).as("cell"),
          transform(col("v"), x => x.cast("double")).as("centroid")))
    for (_ <- 1 to iters) {
      val assigned = kMeansAssign(pts, toDF(local))
      local = toLocal(centroids(assigned, col("cell"), col("v")))
    }
    toDF(local)
  }

  /** Assign each point to its nearest centroid (L2), ties to the
    * lowest cell id. Returns (id, v, cell).
    */
  def kMeansAssign(pts: DataFrame, cents: DataFrame): DataFrame = {
    val d2 = aggregate(
      zip_with(col("v"), col("centroid"),
        (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0d), (acc, x) => acc + x)
    pts.crossJoin(broadcast(cents))
      .groupBy(col("id"))
      .agg(
        min_by(col("cell"), struct(d2.as("d"), col("cell"))).as("cell"),
        first(col("v")).as("v"))
  }

  /** IVF over k-means cells: fit, assign, probe the nearest cell to
    * the query, brute-force inside it. At 100 TB, write the table
    * partitioned by `cell` and the probe becomes partition pruning.
    */
  def ivfKMeansTopK(df: DataFrame, id: Column, vec: Column,
                    queryPred: Column, k: Int, cells: Int, iters: Int): DataFrame = {
    val pts = df.filter(!queryPred)
    val cents = kMeansFit(pts, id, vec, cells, iters)
    val assigned = kMeansAssign(pts.select(id.as("id"), vec.as("v")), cents)
    val q = df.filter(queryPred).select(vec.as("qv")).limit(1)
    val best = cents.crossJoin(broadcast(q))
      .select(col("cell"), cosine(col("centroid"), col("qv")).as("csim"))
      .orderBy(col("csim").desc, col("cell").asc)
      .limit(1).select(col("cell"))
    assigned.join(broadcast(best), "cell")
      .crossJoin(broadcast(q))
      .select(col("id"), col("cell").as("picked_cell"), cosine(col("v"), col("qv")).as("sim"))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)
  }

  /** IVF-style ANN: pick the nearest centroid cell to the query by
    * cosine, then brute-force top-k within that cell only.
    */
  def ivfTopK(df: DataFrame, id: Column, cell: Column, vec: Column,
              queryPred: Column, k: Int): DataFrame = {
    val q = df.filter(queryPred).select(vec.as("qv")).limit(1)
    val cents = centroids(df.filter(!queryPred), cell, vec)
    val best = cents.crossJoin(broadcast(q))
      .select(col("cell"), cosine(col("centroid"), col("qv")).as("csim"))
      .orderBy(col("csim").desc, col("cell").asc)
      .limit(1)
      .select(col("cell"))
    df.filter(!queryPred)
      .join(broadcast(best), cell === best("cell"))
      .crossJoin(broadcast(q))
      .select(id.as("id"), cell.as("picked_cell"), cosine(vec, col("qv")).as("sim"))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)
  }
}
