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

  /** Left-to-right dot product of two float/double-array columns in
    * double — the native [[graft.functions.VecExprs.VecDot]] kernel
    * (the `aggregate(zip_with(...))` composition it replaces evaluates
    * interpreted lambdas per element and dominated every ANN query's
    * runtime; the fold order and widening are bit-identical).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VecExprs.vecDot(a, b)

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

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    * SIGIR'98) — the diversity-aware final stage of a retrieval
    * pipeline: from the `nCandidates` most query-similar items, pick
    * `k` greedily by  score(d) = λ·rel(d) − (1−λ)·max_{s∈S} cos(d,s),
    * where S is the already-selected set (first pick = highest
    * relevance; ties to the lowest id). Returns (rank, id, rel, mmr).
    *
    * Scale shape: candidate generation is the distributed part — one
    * broadcast-query scan and a top-`nCandidates` cut (swap in the
    * IVF/PQ retrievers upstream at 100 TB); the greedy itself runs on
    * the driver over the collected candidate page, which is
    * `nCandidates`-bounded BY CONSTRUCTION (a rerank page, never the
    * corpus — the model-sized-collect rule). The pairwise max-sim is
    * maintained incrementally (each step computes similarities to the
    * newest pick only), the same running-min/max discipline as
    * [[kCenterSample]]. All driver arithmetic is the ascending-index
    * float→double fold the engines share, so results are
    * oracle-exact.
    */
  def mmrRerank(df: DataFrame, id: Column, vec: Column, queryPred: Column,
                nCandidates: Int, k: Int, lambda: Double): DataFrame = {
    require(k >= 1 && nCandidates >= k,
      s"mmrRerank: need nCandidates >= k >= 1, got k=$k n=$nCandidates")
    val spark = df.sparkSession
    import spark.implicits._
    val q = df.filter(queryPred)
      .select(transform(vec, x => x.cast("double")).as("qv")).limit(1)
    val cands = df.filter(!queryPred)
      .select(id.cast("long").as("id"),
        transform(vec, x => x.cast("double")).as("v"))
      .crossJoin(broadcast(q))
      .select(col("id"), col("v"), cosine(col("v"), col("qv")).as("rel"))
      .orderBy(col("rel").desc, col("id").asc)
      .limit(nCandidates)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    def dotD(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0d; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cosD(a: Array[Double], b: Array[Double]): Double =
      dotD(a, b) / (math.sqrt(dotD(a, a)) * math.sqrt(dotD(b, b)))
    val maxSim = Array.fill(cands.length)(0.0d)
    val taken = Array.fill(cands.length)(false)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Double)]
    var rank = 1
    while (rank <= k && out.size < cands.length) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      cands.indices.foreach { i =>
        if (!taken(i)) {
          val s = lambda * cands(i)._3 - (1.0d - lambda) * maxSim(i)
          // strict improvement keeps the earliest (lowest-rel-rank =
          // lowest id at equal rel) candidate on ties
          if (s > bestScore) { best = i; bestScore = s }
        }
      }
      taken(best) = true
      out += ((rank, cands(best)._1, cands(best)._3, bestScore))
      cands.indices.foreach { i =>
        if (!taken(i)) {
          val c = cosD(cands(i)._2, cands(best)._2)
          if (c > maxSim(i)) maxSim(i) = c
        }
      }
      rank += 1
    }
    out.toSeq.toDF("rank", "id", "rel", "mmr")
  }

  /** Sign-bit signature of a 64-dim vector as TWO 32-bit words
    * (bit i of word j = sign of component 32j+i) — the 1-bit
    * quantization of Charikar's hyperplane LSH with coordinate
    * hyperplanes. Words stay below 2^32 so every downstream shift and
    * xor is engine-portable (the cross-engine bit-op discipline:
    * DuckDB errors on 64-bit shifts); disjoint bits make `+` exactly
    * `or`, keeping the fold associative.
    */
  def signBits64(v: Column): (Column, Column) = {
    // typed DSL, not expr() interpolation: Column.toString only
    // round-trips for plain attribute references, so a derived or
    // aliased vector column would parse wrong (or not at all) inside
    // an interpolated SQL string. call_function("shiftleft", ...)
    // because the functions.shiftleft overload takes a literal Int
    // shift, and the lambda variable is a Column.
    def word(off: Int): Column =
      aggregate(sequence(lit(0), lit(31)), lit(0L),
        (acc, i) => acc + when(get(v, i + lit(off)) > lit(0f),
          call_function("shiftleft", lit(1L), i)).otherwise(lit(0L)))
    (word(0), word(32))
  }

  /** Binary-quantized ANN: Hamming distance on 128-bit sign
    * signatures picks `candidates` (ascending Hamming, id
    * tie-break), exact cosine reranks them to the final `k` — the
    * memory-floor scale path (8 bytes + id per vector scanned vs 256
    * bytes of float32), the standard binary-quantization recall
    * recipe. Both stages are TakeOrdered cuts, never a full sort;
    * only the ≤ `candidates` survivors touch their float vectors
    * again. Returns (id, ham, sim).
    */
  def signBitTopK(df: DataFrame, id: Column, vec: Column,
                  queryPred: Column, candidates: Int, k: Int): DataFrame = {
    val (w0, w1) = signBits64(vec)
    val q = df.filter(queryPred)
      .select(vec.as("qv"), w0.as("q0"), w1.as("q1")).limit(1)
    val ham = call_function("bit_count", col("w0").bitwiseXOR(col("q0"))) +
      call_function("bit_count", col("w1").bitwiseXOR(col("q1")))
    val cand = df.filter(!queryPred)
      .select(id.as("id"), vec.as("v"), w0.as("w0"), w1.as("w1"))
      .crossJoin(broadcast(q))
      .select(col("id"), col("v"), col("qv"), ham.cast("long").as("ham"))
      .orderBy(col("ham").asc, col("id").asc)
      .limit(candidates)
    cand
      .select(col("id"), col("ham"), cosine(col("v"), col("qv")).as("sim"))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)
  }

  /** Filtered (metadata-constrained) top-k — the RAG-retrieval shape
    * "nearest neighbors among documents WHERE <predicate>". The
    * predicate is applied BEFORE any distance is computed, so it
    * reaches the scan as an ordinary pushed filter (partition pruning
    * at 100 TB when the corpus is partitioned on the filter column)
    * and the O(dim) cosine kernel runs only on survivors — the
    * post-filter alternative both wastes distance work and can return
    * < k rows. The query row is looked up in the UNfiltered frame:
    * the query need not satisfy the candidate predicate.
    */
  def filteredTopK(df: DataFrame, id: Column, vec: Column,
                   queryPred: Column, candPred: Column, k: Int): DataFrame = {
    val q = df.filter(queryPred).select(vec.as("qv")).limit(1)
    df.filter(candPred && !queryPred)
      .crossJoin(broadcast(q))
      .select(id.as("id"), cosine(vec, col("qv")).as("sim"))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)
  }

  /** Per-cell mean centroids from (cell, vec) — elementwise average
    * as ONE map-side-combined aggregate ([[graft.functions.VecAgg
    * .vecMean]]). The previous posexplode → per-(cell,pos) avg →
    * re-assemble form paid a dim× row explosion and two exchanges per
    * call — per Lloyd iteration in [[kMeansFit]]; the vector buffer
    * folds in the same per-partition row order (same fixture-stability
    * class), and the exchange carries k dim-length partials.
    */
  def centroids(df: DataFrame, cell: Column, vec: Column): DataFrame =
    df.groupBy(cell.as("cell"))
      .agg(graft.functions.VecAgg.vecMean(
        transform(vec, x => x.cast("double"))).as("centroid"))

  /** Deterministic ±1 random-hyperplane signs for SRP-LSH: entry
    * (p, j) is the parity of md5("p|j")'s first byte — well-mixed,
    * seed-free, identical across runs and engines. nbits×dim is tiny
    * (driver-side constant folding, never a runtime cost).
    */
  private[llm] def srpSigns(nbits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nbits, dim) { (p, j) =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$p|$j".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1.0d else -1.0d
    }

  /** SRP-LSH bit signature (sign of the dot with each ±1 hyperplane)
    * as `nbits` "0"/"1" string columns m0..m{nbits-1} — the same shape
    * [[graft.llm.Dedup.lshBands]] consumes, so embedding LSH reuses
    * the MinHash band/bucket machinery unchanged. A positively scaled
    * copy of a vector (cosine exactly 1) has an identical signature,
    * so exact duplicates are *always* candidates, in every band.
    */
  def srpSignature(prepared: DataFrame, nbits: Int, dim: Int): DataFrame = {
    // all nbits sign dots in ONE compiled pass per row (SrpBits); the
    // per-plane when(dot(...)) form re-walked the vector nbits times
    // through interpreted lambdas
    val signs = srpSigns(nbits, dim)
    val bits = graft.functions.VecExprs.srpBitsCol(col("v"),
      signs.map(_.toIndexedSeq).toIndexedSeq)
    prepared
      .select(col("id"), bits.as("__bits"))
      .select(col("id") +:
        (0 until nbits).map(p => col("__bits").getItem(p).as(s"m$p")): _*)
  }

  /** Cosine near-duplicate pairs (id_a < id_b, cosine ≥ threshold),
    * fully distributed: random-hyperplane LSH bucketing (signature →
    * bands → per-bucket candidate join via [[Dedup.lshCandidates]])
    * followed by an exact cosine verify of the candidates only. No
    * driver collect anywhere; every stage shuffles on a key (band
    * bucket / id), so the pair space is bucket-local, never all-pairs.
    *
    * Recall: pairs at cosine 1.0 (scaled copies) share all bands —
    * recall 1. For threshold-grazing pairs recall is the standard SRP
    * tradeoff 1−(1−(1−θ/π)^bandsOf)^(nbits/bandsOf). At the defaults
    * (nbits=192, bandsOf=12 → 16 bands) and the advertised threshold
    * 0.9 (θ≈0.451, per-bit agreement ≈0.856) this is ≥0.93 — the
    * stated recall floor. Band WIDTH also sets the scale exponent:
    * random (cosine≈0) pairs collide per band at ~2^−bandsOf, so
    * bands·2^−bandsOf of ALL pairs become candidates — an O(N²) term
    * that dominated the r7 10× ScaleBench (8-bit bands: 1/32 of
    * pairs, 9.0M candidates, exponent 0.70 in SrpScaleProbe). The
    * 12-bit geometry keeps the recall floor while admitting 16/4096
    * ≈ 0.4% of random pairs (1.4M candidates, exponent 0.49
    * measured 2026-08-13); candidate cost per kept recall point only
    * rises beyond that (16-bit bands halve candidates again but drop
    * recall to 0.50–0.75). Raise nbits or lower bandsOf for more
    * recall at more candidate cost; callers needing the literal
    * all-pairs contract use [[nearDupPairsExact]]. Verification is
    * exact, so precision is always 1 either way.
    *
    * Determinism: the verify dot folds ascending-index over doubles
    * ([[dot]]), matching DuckDB's list_dot_product bit-for-bit.
    *
    * @param dim embedding dimensionality (hyperplane width)
    */
  def nearDupPairs(df: DataFrame, id: Column, vec: Column, threshold: Double,
                   dim: Int = 64, nbits: Int = 192, bandsOf: Int = 12): DataFrame = {
    // no up-front cast: VecDot/SrpBits widen floats exactly during
    // accumulation, so the interpreted transform() copy is pure cost
    val prepared = df.select(id.cast("long").as("id"), vec.as("v"))
      .withColumn("n", l2Norm(col("v")))
    val cand = Dedup.lshCandidates(
      Dedup.lshBands(srpSignature(prepared, nbits, dim), nbits, bandsOf))
    val a = prepared.select(col("id").as("id_a"), col("v").as("va"), col("n").as("na"))
    val b = prepared.select(col("id").as("id_b"), col("v").as("vb"), col("n").as("nb"))
    cand.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("c"))
      .filter(col("c") >= threshold)
  }

  /** Exact all-pairs mode of [[nearDupPairs]]: recall exactly 1 at
    * any threshold, at O(N²/2) verified pairs — the mode to use when
    * the public contract is "every pair ≥ threshold" and the data may
    * hold threshold-grazing pairs LSH would sample away. Distributed
    * (the pair space shuffles across executors), but quadratic:
    * right for ≤10⁵-vector partitions (dedup within a shard/day),
    * not whole-corpus sweeps — that's what the LSH path is for.
    */
  def nearDupPairsExact(df: DataFrame, id: Column, vec: Column,
                        threshold: Double): DataFrame = {
    val prepared = df.select(id.cast("long").as("id"), vec.as("v"))
      .withColumn("n", l2Norm(col("v")))
    val a = prepared.select(col("id").as("id_a"), col("v").as("va"), col("n").as("na"))
    val b = prepared.select(col("id").as("id_b"), col("v").as("vb"), col("n").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("c"))
      .filter(col("c") >= threshold)
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
    // Each Lloyd iteration's centroid collect is an action, so without
    // a persist the input lineage (scan + cast) re-executes iters+1
    // times. At 100 TB don't fit on the full corpus at all — fit on a
    // Sampling.hashSample subset (deterministic, so the fit is
    // reproducible) and let assignment stream the full data once.
    // one canonical hash(id) exchange before iterating: the per-cell
    // centroid averages are float folds, so their ulps must not
    // depend on the CALLER's partitioning — the old crossJoin-based
    // assign paid an id exchange EVERY iteration for this layout
    // normalization; one explicit repartition buys it once
    val pts = df.select(id.as("id"), vec.as("v")).repartition(col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
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
      val assigned = kMeansAssignLocal(pts, local)
      local = toLocal(centroids(assigned, col("cell"), col("v")))
    }
    pts.unpersist(false)
    toDF(local)
  }

  /** Assign each point to its nearest centroid (L2), ties to the
    * lowest cell id. Returns (id, cell, v).
    *
    * Pure MAP, no join: the k centroids are collected (they are k
    * rows by construction — a model, not data) and inlined as array
    * literals, so each point computes its argmin as a `least` over k
    * (distance, cell) structs inside the scan stage. The previous
    * crossJoin+groupBy form paid an id exchange per call (the k×
    * fan-out itself collapsed map-side in the partial min_by, so the
    * exchange carried one row per point — but it carried it, per
    * Lloyd iteration, plus a full hash-aggregate pass, for work a
    * projection does in place). See [[pqAssign]] for the measured
    * counter-case where the join form wins.
    */
  def kMeansAssign(pts: DataFrame, cents: DataFrame): DataFrame =
    kMeansAssignLocal(pts,
      // resolve by NAME and cast: a caller-supplied cents frame with
      // reordered columns or array<float> centroids must work (or fail
      // at analysis with the column name), not ClassCastException on a
      // positional getSeq
      cents.select(col("cell").cast("int").as("cell"),
          col("centroid").cast("array<double>").as("centroid"))
        .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq)

  private[llm] def kMeansAssignLocal(pts: DataFrame,
                                     local: Seq[(Int, Seq[Double])]): DataFrame = {
    require(local.nonEmpty, "kMeansAssign needs at least one centroid")
    val cands = local.sortBy(_._1).map { case (cell, c) =>
      struct(
        graft.functions.VecExprs.vecL2Sq(col("v"), typedLit(c)).as("d"),
        lit(cell).as("cell"))
    }
    // least over (d, cell) structs ≡ min_by(cell, struct(d, cell)):
    // distance first, lowest cell on ties (least needs ≥ 2 args)
    val cell =
      if (cands.size == 1) lit(local.head._1)
      else least(cands: _*).getField("cell")
    pts.select(col("id"), cell.as("cell"), col("v"))
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

  /** Multi-probe IVF: probe the `nprobe` nearest centroid cells
    * instead of one — the standard recall knob (a query near a cell
    * boundary has true neighbors in the runner-up cell; probing it
    * trades `nprobe`× the scanned candidates for recall without
    * touching the index). Cell ranking is by centroid cosine with a
    * cell-id tiebreak, so the probed set is deterministic; at scale
    * the probed cells are partition keys and everything else stays
    * partition-pruned out.
    */
  def ivfTopKMultiProbe(df: DataFrame, id: Column, cell: Column, vec: Column,
                        queryPred: Column, k: Int, nprobe: Int): DataFrame = {
    val q = df.filter(queryPred).select(vec.as("qv")).limit(1)
    val cents = centroids(df.filter(!queryPred), cell, vec)
    val probed = cents.crossJoin(broadcast(q))
      .select(col("cell"), cosine(col("centroid"), col("qv")).as("csim"))
      .orderBy(col("csim").desc, col("cell").asc)
      .limit(nprobe)
      .select(col("cell"))
    df.filter(!queryPred)
      .join(broadcast(probed), cell === probed("cell"))
      .crossJoin(broadcast(q))
      .select(id.as("id"), cell.as("picked_cell"), cosine(vec, col("qv")).as("sim"))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)
  }

  /** Greedy k-center / farthest-point traversal (Gonzalez, TCS 1985)
    * — the diversity-coreset selector of a curation pipeline: pick the
    * smallest-id point, then k−1 times the point maximizing its
    * min-L2²-distance to everything selected so far (ties to the
    * lowest id). A 2-approximation to the k-center objective, and the
    * standard "select a maximally diverse subset" pass (data pruning /
    * active-learning seeding).
    *
    * Returns (rank, id, d): selection order, point id, and the
    * min-distance² to the previously selected set at selection time
    * (null for the seed) — d is the coverage radius curve, the knob a
    * curation run reads to pick k.
    *
    * Execution shape = [[kMeansFit]]'s driver loop, INCREMENTAL form:
    * the candidate frame carries a running min-distance column `d`,
    * and each step computes the distance to the NEWLY selected center
    * only, folding it in with `least(d, dist_new)` — O(k) distance
    * evaluations per point total, versus the textbook re-scan of all
    * selected centers per step (O(k²), a latent large-k cost). The
    * running min over doubles is exactly the batch `least` over all
    * centers (min is associative, no fold hazard), so the argmax picks
    * — orderBy(d DESC, id) LIMIT 1 — are identical. k sequential jobs
    * by construction (each pick conditions the next); every candidate
    * generation is persisted and the lineage is severed by a local
    * checkpoint every 8 steps so the plan stays O(1) per step; at
    * 100 TB run it on a [[graft.llm.Sampling]].hashSample like any
    * other fit.
    */
  def kCenterSample(df: DataFrame, id: Column, vec: Column, k: Int): DataFrame = {
    require(k >= 1, s"kCenterSample: k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val pts = df.select(id.cast("long").as("id"),
        transform(vec, x => x.cast("double")).as("v"))
      .persist(lvl)
    val seedRows = pts.filter(col("id").isNotNull).orderBy(col("id")).limit(1).collect()
    if (seedRows.isEmpty) {
      pts.unpersist(false)
      throw new IllegalArgumentException(
        "kCenterSample: input has no rows with a non-null id")
    }
    val seed = seedRows.head
    val seedId = seed.getLong(0)
    var selected = Vector[(Long, java.lang.Double)]((seedId, null))
    // candidates with the running min-L2² to the selected set
    var cur = pts
      .filter(col("id").isNotNull && col("id") =!= seedId)
      .select(col("id"), col("v"),
        graft.functions.VecExprs.vecL2Sq(col("v"),
          typedLit(seed.getSeq[Double](1))).as("d"))
      .persist(lvl)
    var sinceCheckpoint = List[DataFrame](cur)
    var done = false
    while (selected.size < k && !done) {
      val next = cur.orderBy(col("d").desc, col("id").asc).limit(1).collect()
      if (next.isEmpty) done = true
      else {
        val nId = next.head.getLong(0)
        val nVec = next.head.getSeq[Double](1)
        selected :+= ((nId, java.lang.Double.valueOf(next.head.getDouble(2))))
        val upd = cur.filter(col("id") =!= nId)
          .select(col("id"), col("v"),
            least(col("d"),
              graft.functions.VecExprs.vecL2Sq(col("v"), typedLit(nVec)))
              .as("d"))
        if (selected.size % 8 == 0) {
          // sever lineage + release every generation since the last cut
          cur = upd.localCheckpoint(true)
          sinceCheckpoint.foreach(_.unpersist(false))
          sinceCheckpoint = Nil
        } else {
          cur = upd.persist(lvl)
          sinceCheckpoint ::= cur
        }
      }
    }
    sinceCheckpoint.foreach(_.unpersist(false))
    pts.unpersist(false)
    selected.zipWithIndex
      .map { case ((i, d), r) => (r + 1, i, Option(d).map(_.doubleValue)) }
      .toDF("rank", "id", "d")
  }

  // ------------------------------------------- product quantization

  /** Explode a double-array column into (mSub) sub-vectors:
    * one output row per (input row, subspace m), `subv` = the m-th
    * `dim/mSub`-wide slice. The decomposition PQ quantizes per
    * subspace (Jégou et al., "Product quantization for nearest
    * neighbor search", TPAMI 2011).
    */
  def subVectors(df: DataFrame, vec: Column, mSub: Int, dim: Int): DataFrame = {
    require(dim % mSub == 0, s"dim $dim not divisible into $mSub subspaces")
    val dsub = dim / mSub
    val subs = array((0 until mSub).map(m =>
      struct(lit(m).as("m"), slice(vec, m * dsub + 1, dsub).as("subv"))): _*)
    df.withColumn("__sub", explode(subs))
      .withColumn("m", col("__sub.m"))
      .withColumn("subv", col("__sub.subv"))
      .drop("__sub")
  }

  /** Deterministic grouped Lloyd fit of PQ codebooks over the
    * exploded sub-vector frame (id, m, subv): every subspace fits in
    * the SAME distributed job per iteration — `m` is just a grouping
    * key, so M subspaces cost one assign + one mean-recompute per
    * round, not M sequential fits. Init: per subspace, the
    * sub-vectors of the `ksub` smallest ids; assignment ties break to
    * the lowest code. Returns (m, code, centroid) — M·ksub·dsub
    * doubles, trivially broadcastable forever.
    *
    * At 100 TB fit on a [[Sampling]] hash-sample subset (the fit is
    * deterministic, so sampled codebooks are reproducible) and let
    * [[pqAssign]] stream the full corpus once.
    */
  def pqFit(sub: DataFrame, ksub: Int, iters: Int): DataFrame = {
    val spark = sub.sparkSession
    import spark.implicits._
    // canonical hash(id) layout before iterating — the codebook avg
    // folds must not inherit the caller's partitioning (kMeansFit
    // rationale)
    val pts = sub.select(col("id"), col("m"), col("subv")).repartition(col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // codebooks collect to the driver each round (tiny) so iteration
    // i's plan doesn't nest all prior rounds — same discipline as
    // kMeansFit above
    def toLocal(cb: DataFrame): Seq[(Int, Int, Seq[Double])] =
      cb.collect().map(r => (r.getAs[Number]("m").intValue(),
        r.getAs[Number]("code").intValue(), r.getSeq[Double](2))).toSeq
    def toDF(local: Seq[(Int, Int, Seq[Double])]): DataFrame =
      local.toDF("m", "code", "centroid")
    val wInit = Window.partitionBy(col("m")).orderBy(col("id"))
    var local = toLocal(
      pts.withColumn("rn", row_number().over(wInit))
        .filter(col("rn") <= ksub)
        .select(col("m"), (col("rn") - 1).as("code"),
          transform(col("subv"), x => x.cast("double")).as("centroid")))
    for (_ <- 1 to iters) {
      val assigned = pqAssign(pts, toDF(local))
      local = toLocal(
        assigned.select(col("m"), col("code"), posexplode(col("subv")).as(Seq("pos", "x")))
          .groupBy(col("m"), col("code"), col("pos"))
          .agg(avg(col("x").cast("double")).as("c"))
          .groupBy(col("m"), col("code"))
          .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
          .select(col("m"), col("code"),
            transform(col("pc"), x => x.getField("c")).as("centroid")))
    }
    pts.unpersist(false)
    toDF(local)
  }

  /** Assign each (id, m) sub-vector its nearest codeword (L2, ties to
    * the lowest code). Keeps every non-(m,subv) input column via the
    * grouping key; returns the input columns plus `code`.
    *
    * Deliberately the broadcast-join + regroup form, NOT the
    * [[kMeansAssign]] inlined-model projection — measured both ways
    * (sf0.1, shared session): the M·ksub-literal CASE the projection
    * needs re-compiles per fit-iteration plan and cost +0.9 s on
    * `llm_ivf_pq`, while the exchange here is harmless — the partial
    * min_by collapses the ksub join fan-out map-side, so the shuffle
    * carries one row per (id, m), the input's own cardinality. (The
    * k-means case differs: one small `least` per row, no CASE, and
    * the exchange there bought nothing.)
    */
  def pqAssign(sub: DataFrame, codebook: DataFrame): DataFrame = {
    val d2 = graft.functions.VecExprs.vecL2Sq(col("subv"), col("centroid"))
    val carried = sub.columns.filterNot(Set("m", "subv", "centroid", "code"))
    sub.join(broadcast(codebook), "m")
      .groupBy((col("id") +: col("m") +: carried.filterNot(_ == "id").map(col)): _*)
      .agg(
        min_by(col("code"), struct(d2.as("d"), col("code"))).as("code"),
        first(col("subv")).as("subv"))
  }

  /** IVF-PQ ANN (the public IVFADC design, Jégou et al. TPAMI 2011):
    * coarse cells prune the scan, product-quantized RESIDUALS
    * (v − cell centroid) give each candidate an O(M) asymmetric
    * distance instead of an O(dim) exact one, and an exact-cosine
    * rerank of the top-`rerank` approximate candidates restores
    * precision. This is the memory-bounded 100 TB vector path: the
    * scan inside a probed cell touches only M small int codes + one
    * stored norm per vector (the raw vectors stay in cold storage and
    * are fetched just for the `rerank` survivors).
    *
    * Inner-product ADC: ip(v,q) = ip(cent_cell,q) + ip(resid,q)
    *                            ≈ ip(cent_cell,q) + Σₘ ip(cb[m][codeₘ], q_subₘ)
    * so the per-query work is one M·ksub dot table + one per-cell
    * constant; cosine divides by the EXACT stored ‖v‖, so direction
    * is quantized but magnitude never is. The Σₘ folds in ascending-m
    * order over an explicitly sorted collect, keeping the approximate
    * scores (and thus the rerank candidate set) deterministic and
    * engine-exact up to the fixture-stability caveat shared with
    * [[kMeansFit]] (avg() centroids are summation-order-dependent;
    * near-ties below ~1e-12 could flip, absent in the fixture).
    *
    * Scale notes: codes/norms are written partitioned by `cell`, so
    * probing is partition pruning; the codebook + query table + probed
    * cell list are all O(M·ksub + cells) broadcasts; nothing driver-
    * side exceeds the codebook. Recall knobs: `nprobe` (cells
    * scanned) and `rerank` (exact rescores) — spec pins full-probe +
    * full-rerank ≡ brute force.
    */
  def ivfPqTopK(df: DataFrame, id: Column, cell: Column, vec: Column,
                queryPred: Column, k: Int, nprobe: Int, rerank: Int,
                mSub: Int = 4, dim: Int = 64, ksub: Int = 8,
                iters: Int = 3): DataFrame = {
    val pts = df.filter(!queryPred)
      .select(id.cast("long").as("id"), cell.as("cell"),
        transform(vec, x => x.cast("double")).as("v"))
      .withColumn("nv", l2Norm(col("v")))
    val cents = centroids(pts, col("cell"), col("v"))
    val resid = pts.join(broadcast(cents), "cell")
      .select(col("id"), col("cell"),
        zip_with(col("v"), col("centroid"), (a, b) => a - b).as("r"))
    val sub = subVectors(resid, col("r"), mSub, dim)
      .select(col("id"), col("cell"), col("m"), col("subv"))
    val cb = pqFit(sub, ksub, iters)
    val codes = pqAssign(sub, cb).select(col("id"), col("cell"), col("m"), col("code"))

    val q = df.filter(queryPred)
      .select(transform(vec, x => x.cast("double")).as("qv")).limit(1)
      .withColumn("nq", l2Norm(col("qv")))
    val dsub = dim / mSub
    // ADC table: ip of each codeword with the query's matching slice
    val tab = cb.crossJoin(broadcast(q))
      .select(col("m"), col("code"),
        dot(col("centroid"), slice(col("qv"), col("m") * dsub + 1, lit(dsub))).as("ip"))
    val cconst = cents.crossJoin(broadcast(q))
      .select(col("cell"), dot(col("centroid"), col("qv")).as("cip"),
        (dot(col("centroid"), col("qv")) / (l2Norm(col("centroid")) * col("nq"))).as("csim"))
    val probed = cconst.orderBy(col("csim").desc, col("cell").asc)
      .limit(nprobe).select(col("cell"), col("cip"))

    // approximate score, probed cells only — codes prune on the
    // broadcast cell list BEFORE any per-id work
    val rip = codes.join(broadcast(probed.select(col("cell"))), "cell")
      .join(broadcast(tab), Seq("m", "code"))
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("m"), col("ip")))).as("ips"))
      .select(col("id"),
        aggregate(col("ips"), lit(0.0d), (acc, x) => acc + x.getField("ip")).as("rip"))
    val cand = pts.join(broadcast(probed), "cell")
      .join(rip, "id")
      .crossJoin(broadcast(q))
      .select(col("id"), col("cell").as("picked_cell"), col("v"), col("qv"),
        ((col("cip") + col("rip")) / (col("nv") * col("nq"))).as("approx"))
      .orderBy(col("approx").desc, col("id").asc)
      .limit(rerank)
    // exact rerank of the surviving candidates only
    cand.select(col("id"), col("picked_cell"), cosine(col("v"), col("qv")).as("sim"))
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

  /** Batch k-NN join — the retrieval/eval form of [[bruteForceTopK]]:
    * for EVERY query row (selected by `queryPred`), the cosine top-k
    * among the non-query rows. The query set is assumed bounded (an
    * eval batch, a probe set) and broadcasts; the corpus is read ONCE
    * and never shuffles on its own cardinality: the per-query top-k
    * is the plain window + `rn ≤ k` filter whose rank-limit pushdown
    * ([[Sampling.capPerGroup]]'s plan shape, SPARK-37099) pre-trims
    * each map partition to k rows per query before the exchange — the
    * reducer sees k·partitions rows per query, not the corpus.
    *
    * Returns (qid, id, sim), exact by construction (the scale path
    * for an UNbounded query set is an LSH/IVF candidate join —
    * [[ivfKnnJoin]]).
    */
  def knnJoin(df: DataFrame, id: Column, vec: Column,
              queryPred: Column, k: Int): DataFrame = {
    val q = df.filter(queryPred).select(id.as("qid"), vec.as("qv"))
    val scored = df.filter(!queryPred)
      .crossJoin(broadcast(q))
      .select(col("qid"), id.as("id"), cosine(vec, col("qv")).as("sim"))
    Sampling.capPerGroup(scored, col("qid"), -col("sim"), col("id"), k)
  }

  /** IVF form of [[knnJoin]]: each query is routed to its nearest
    * centroid cell (by cosine, cell-id tiebreak) and scored against
    * THAT CELL's members only — the candidate scan drops from |corpus|
    * to |picked cells|, the approximation [[annRecall]]-style
    * evaluation quantifies. Centroids derive from the given `cell`
    * column ([[centroids]]); both the centroid table and the routed
    * query set broadcast.
    */
  def ivfKnnJoin(df: DataFrame, id: Column, cell: Column, vec: Column,
                 queryPred: Column, k: Int): DataFrame = {
    val cand = df.filter(!queryPred)
    val cents = centroids(cand, cell, vec)
    val q = df.filter(queryPred).select(id.as("qid"), vec.as("qv"))
    val routed = Sampling.capPerGroup(
      q.crossJoin(broadcast(cents))
        .select(col("qid"), col("qv"), col("cell"),
          cosine(col("qv"), col("centroid")).as("csim")),
      col("qid"), -col("csim"), col("cell"), 1)
      .select(col("qid"), col("qv"), col("cell"))
    val scored = cand
      .select(cell.as("cell"), id.as("id"), vec.as("v"))
      .join(broadcast(routed), Seq("cell"))
      .select(col("qid"), col("id"), col("cell").as("picked_cell"),
        cosine(col("v"), col("qv")).as("sim"))
    Sampling.capPerGroup(scored, col("qid"), -col("sim"), col("id"), k)
  }

  /** Recall@k of [[ivfKnnJoin]] against the exact [[knnJoin]] ground
    * truth, per query — the self-evaluation step an ANN deployment
    * runs on a probe set before trusting the index (the recall curves
    * of Jégou et al. TPAMI'11 §V). Both sides run over the same
    * frame; hits join on (qid, id); a LEFT join from the truth side
    * keeps queries with zero approximate hits at recall 0 rather than
    * dropping them.
    *
    * Returns (qid, n_hit, recall) with recall = n_hit / k.
    */
  def annRecall(df: DataFrame, id: Column, cell: Column, vec: Column,
                queryPred: Column, k: Int): DataFrame = {
    val truth  = knnJoin(df, id, vec, queryPred, k)
      .select(col("qid"), col("id"))
    val approx = ivfKnnJoin(df, id, cell, vec, queryPred, k)
      .select(col("qid"), col("id"), lit(1L).as("hit"))
    truth.join(approx, Seq("qid", "id"), "left")
      .groupBy(col("qid"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("qid"), col("n_hit"),
        (col("n_hit").cast("double") / k).as("recall"))
  }

  /** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", arXiv:2303.09540):
    * semantic near-duplicate pruning via k-means clustering followed
    * by within-cluster cosine comparison. Items in a cluster are
    * ranked by cosine-to-centroid descending (id ascending breaks
    * ties); an item is DROPPED when some earlier-ranked item in the
    * same cluster has cosine ≥ `tau` to it — one representative per
    * semantic group survives, preferring the most central. This is
    * the pairwise-matrix form of the paper's dedup (no sequential
    * greedy dependency), so the drop set is a single cluster-local
    * join, not an iterative loop.
    *
    * Scale: pairwise work is cluster-local — O(Σ|cell|²) — and the
    * paper's own regime scales k with N to bound |cell| (SemDeDup
    * uses 50k clusters for LAION-440M). Every shuffle is keyed by
    * `cell`; centroids are the only driver-side state (k×dim, from
    * [[kMeansFit]], which documents the fit-on-sample path for
    * 100 TB). For a mega-cell that still overflows the quadratic
    * verify, [[nearDupPairs]]' SRP banding composes as an in-cell
    * prefilter.
    *
    * Returns (id, cell, keep) for every input row.
    */
  def semanticDedup(df: DataFrame, id: Column, vec: Column,
                    k: Int, iters: Int, tau: Double): DataFrame = {
    val pts = df.select(id.cast("long").as("id"), vec.as("v"))
    val cents = kMeansFit(pts, col("id"), col("v"), k, iters)
    val ranked = kMeansAssign(pts, cents)
      .join(broadcast(cents), "cell")
      .select(col("id"), col("cell"), col("v"),
        cosine(col("v"), col("centroid")).as("csim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("cell")).orderBy(col("csim").desc, col("id"))))
    val a = ranked.select(col("cell"), col("id").as("id_a"),
      col("v").as("va"), col("rk").as("rk_a"))
    val b = ranked.select(col("cell").as("cell_b"), col("id").as("id_b"),
      col("v").as("vb"), col("rk").as("rk_b"))
    val dropped = a.join(b,
        col("cell") === col("cell_b") && col("rk_a") < col("rk_b"))
      .filter(cosine(col("va"), col("vb")) >= tau)
      .select(col("id_b").as("id")).distinct()
      .withColumn("dup", lit(true))
    ranked.join(dropped, Seq("id"), "left")
      .select(col("id"), col("cell"), col("dup").isNull.as("keep"))
  }

  /** Semantic ordering for sequence packing (the in-context
    * pretraining data layout — Shi et al., "In-Context Pretraining:
    * Language Modeling Beyond Document Boundaries", arXiv:2310.10638:
    * related documents adjacent in the token stream, so a context
    * window spans topically-coherent text instead of random splices).
    * K-means cells order the corpus coarsely; within a cell, documents
    * sort by cosine-to-centroid (most central first, ties by id); the
    * global position is [[Packing.groupedRank]]'s two-level rank —
    * no corpus-sized sort anywhere. Feed `rank` to
    * [[Packing.packSequences]] as the packing id.
    *
    * Returns (id, cell, csim, rank).
    */
  def semanticOrder(df: DataFrame, id: Column, vec: Column,
                    k: Int, iters: Int): DataFrame = {
    val pts = df.select(id.cast("long").as("id"), vec.as("v"))
    val cents = kMeansFit(pts, col("id"), col("v"), k, iters)
    val assigned = kMeansAssign(pts, cents)
      .join(broadcast(cents), "cell")
      .select(col("id"), col("cell"),
        cosine(col("v"), col("centroid")).as("csim"))
    Packing.groupedRank(assigned, "cell",
        Seq(col("csim").desc, col("id")))
      .select(col("id"), col("cell"), col("csim"), col("rank"))
  }

  /** Pairwise cosine similarity between per-`group` embedding
    * centroids — the embedding-space counterpart of
    * [[CorpusStats.jsDivergence]]'s token-space drift audit: two
    * sources/snapshots whose centroids drift apart have different
    * semantic composition even when their vocabularies overlap, and a
    * near-1 cosine between supposedly distinct sources flags
    * mislabeled or duplicated provenance before any per-item dedup
    * runs.
    *
    * Cosine is computed from the (group, dim, component) frame in the
    * explicit `Σab / (√Σa²·√Σb²)` form so an oracle reproduces the
    * expression tree; centroid components are plain `avg` over exact
    * per-dim values.
    *
    * Scale: one (group, dim)-keyed average (map-side combined; the
    * explode is pipeline-local, shuffle bounded by |groups|·dim rows
    * regardless of corpus size), then an all-pairs join on the TINY
    * component frame — |groups| is tens, never corpus-sized.
    */
  def centroidMatrix(df: DataFrame, group: Column, vec: Column): DataFrame = {
    val comp = df.select(group.as("grp"), posexplode(vec).as(Seq("i", "x")))
      .groupBy("grp", "i").agg(avg(col("x").cast("double")).as("c"))
    comp.select(col("grp").as("group_a"), col("i"), col("c").as("ca"))
      .join(comp.select(col("grp").as("group_b"), col("i"), col("c").as("cb")), "i")
      .filter(col("group_a") < col("group_b"))
      .groupBy("group_a", "group_b")
      .agg(sum(col("ca") * col("cb")).as("sab"),
        sum(col("ca") * col("ca")).as("saa"),
        sum(col("cb") * col("cb")).as("sbb"))
      .select(col("group_a"), col("group_b"),
        (col("sab") / (sqrt(col("saa")) * sqrt(col("sbb")))).as("cosine"))
  }

  /** Embedding-space outlier scoring — the quality gate for learned
    * representations (mislabeled, corrupted, or off-distribution
    * items sit far from every cluster): k-means the corpus, then
    * z-score each item's L2 distance to its own centroid against its
    * CELL's distance distribution. Per-cell normalization matters —
    * a tight cluster's mild straggler and a diffuse cluster's core
    * member can have the same absolute distance.
    *
    * Variance is computed in the explicit E[d²]−μ² form (not a
    * `stddev` aggregate) so an oracle reproduces the identical
    * expression tree; a single-member cell (σ = 0) scores z = 0.
    *
    * Scale: assignment is the [[kMeansAssign]] broadcast pass; the
    * per-cell moment table is k rows, broadcast back for the z-score
    * map. Nothing pairwise, nothing driver-side beyond centroids.
    *
    * Returns (id, cell, dist, z) for every input row.
    */
  def embedOutliers(df: DataFrame, id: Column, vec: Column,
                    k: Int, iters: Int): DataFrame = {
    // canonical layout: the per-cell distance moments below are float
    // folds — hash(id) partitioning pins their order whatever the
    // caller's scan looked like (the kMeansFit rationale)
    val pts = df.select(id.cast("long").as("id"), vec.as("v"))
      .repartition(col("id"))
    val cents = kMeansFit(pts, col("id"), col("v"), k, iters)
    val assigned = kMeansAssign(pts, cents)
      .join(broadcast(cents), "cell")
      .select(col("id"), col("cell"),
        sqrt(graft.functions.VecExprs.vecL2Sq(col("v"), col("centroid"))).as("dist"))
    val stats = assigned.groupBy("cell").agg(
      count(lit(1)).as("n"), sum(col("dist")).as("sd"),
      sum(col("dist") * col("dist")).as("sdd"))
      .select(col("cell"), (col("sd") / col("n")).as("mu"),
        sqrt(greatest(col("sdd") / col("n") -
          (col("sd") / col("n")) * (col("sd") / col("n")), lit(0.0))).as("sigma"))
    assigned.join(broadcast(stats), "cell")
      .select(col("id"), col("cell"), col("dist"),
        when(col("sigma") > 0, (col("dist") - col("mu")) / col("sigma"))
          .otherwise(lit(0.0)).as("z"))
  }

  /** Hard-negative mining for retrieval-model training (the DPR /
    * Contriever training-data shape, Karpukhin et al. EMNLP'20): per
    * query, the top-k most SIMILAR candidates that are NOT the
    * query's near-duplicates — high-cosine non-dup neighbors are the
    * negatives that teach an encoder fine distinctions; unfiltered
    * top-k would poison training with positives mislabeled negative.
    *
    * `clusters` is an (id, label) near-dup frame ([[Dedup.components]]
    * output); ids absent from it are singletons (their own cluster, the
    * coalesce default). A candidate is excluded iff its cluster equals
    * the query's. Shape: [[knnJoin]]'s broadcast-query scan + two
    * label joins keyed on the ids (AQE sizes them), then the same
    * rank-limit-pushdown top-k — nothing pairwise beyond the
    * bounded-query contract knnJoin already carries.
    */
  def hardNegatives(df: DataFrame, id: Column, vec: Column,
                    queryPred: Column, clusters: DataFrame, k: Int): DataFrame = {
    val q = df.filter(queryPred).select(id.as("qid"), vec.as("qv"))
    val scored = df.filter(!queryPred)
      .crossJoin(broadcast(q))
      .select(col("qid"), id.as("id"), cosine(vec, col("qv")).as("sim"))
    val lab = clusters.select(col("id"), col("label"))
    val filtered = scored
      .join(lab.select(col("id").as("qid"), col("label").as("qlab")),
        Seq("qid"), "left")
      .join(lab.select(col("id"), col("label").as("clab")), Seq("id"), "left")
      .filter(coalesce(col("qlab"), col("qid")) =!= coalesce(col("clab"), col("id")))
      .select(col("qid"), col("id"), col("sim"))
    Sampling.capPerGroup(filtered, col("qid"), -col("sim"), col("id"), k)
  }

  /** Int8 scalar-quantized top-k with exact rerank — the FAISS
    * `SQ8`/`ScalarQuantizer` memory path (Jégou et al.'s baseline to
    * PQ; ~4x smaller than float32 vectors, no training step, unlike
    * [[ivfPqTopK]]'s codebooks): per vector, scale = max|x|/127 and
    * code_i = floor(x_i/scale + 0.5) ∈ [−127, 127] (the explicit
    * floor(+0.5) form so both engines round identically; |x| ≤ max|x|
    * bounds the code without clamping). The approximate score is the
    * exact INTEGER code dot (codes carried as doubles — ≤ dim·127²,
    * exact well under 2⁵³) times the two scales; the top `rerank`
    * approximate candidates rerank by exact float cosine and the top
    * `k` survive.
    *
    * Scale shape: the 100 TB deployment stores (code, scale, norm) —
    * the scan reads dim bytes + 2 doubles per vector instead of dim
    * floats; the query row broadcasts as a 1-row frame; candidate cut
    * is TakeOrderedAndProject (no global sort); only `rerank` rows
    * ever touch full-precision vectors. Deterministic: approximate
    * ties break by id at the cut, exact ties by id at the output.
    */
  def sq8TopK(df: DataFrame, id: Column, vec: Column,
              queryPred: Column, k: Int, rerank: Int): DataFrame = {
    def coded(src: DataFrame): DataFrame = src
      .select(id.as("id"), transform(vec, x => x.cast("double")).as("v"))
      .withColumn("scale",
        array_max(transform(col("v"), x => abs(x))) / lit(127.0d))
      .withColumn("code",
        when(col("scale") === 0.0d, transform(col("v"), _ => lit(0.0d)))
          .otherwise(transform(col("v"),
            x => floor(x / col("scale") + lit(0.5d)))))
    val q = coded(df.filter(queryPred))
      .select(col("v").as("qv"), col("scale").as("qscale"),
        col("code").as("qcode")).limit(1)
    // a zero vector has no direction: its cosine is undefined (and an
    // ANSI divide-by-zero) — excluded from candidacy, not scored 0
    coded(df.filter(!queryPred))
      .filter(col("scale") > 0.0d)
      .crossJoin(broadcast(q))
      .select(col("id"), col("v"), col("qv"),
        (dot(col("code"), col("qcode")) * col("scale") * col("qscale"))
          .as("approx"))
      .orderBy(col("approx").desc, col("id").asc)
      .limit(rerank)
      .select(col("id"), cosine(col("v"), col("qv")).as("sim"))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)
  }

  /** Margin-based pair mining between two embedding sets (Artetxe &
    * Schwenk, "Margin-based Parallel Corpus Mining with Multilingual
    * Sentence Embeddings", ACL 2019 §3: score a candidate pair by its
    * cosine RELATIVE to each side's average top-k neighborhood —
    * the ratio margin — instead of raw cosine, which over-selects
    * hub vectors). For each x ∈ A its best y ∈ B is scored
    * margin(x,y) = cos(x,y) / ((avgₖ(x→B) + avgₖ(y→A)) / 2).
    *
    * Engine-exact by integer quantization: cosines quantize to
    * micro-units (floor(c·10⁶+0.5), one deterministic cut), both
    * neighborhood sums accumulate exact Longs, and the margin is one
    * float division of integer products — no float-sum order anywhere.
    *
    * Scale shape: the A×B pair frame here is the exact (correctness)
    * form; both rank windows and the top-k sums run on the pair frame
    * with rank-limit pushdown bounding each partition. At 100 TB use
    * [[cellMarginMine]], which bounds the pair frame by IVF cells and
    * reuses [[marginScore]] unchanged.
    */
  def marginMine(df: DataFrame, id: Column, vec: Column, sideA: Column,
                 k: Int, topN: Int): DataFrame = {
    // Pin the stream side's parallelism: the broadcast cross join
    // inherits the single-split embeddings scan's ONE partition, so
    // the whole |A|×|B| dot-product wall runs in one task
    // (GenFilterScan round 14c: 3 single-task stages ≥1.3 s;
    // jstack: VecExprs.dot + the rank sort). A numbered repartition
    // is exempt from AQE coalescing and spreads the arithmetic.
    val a = df.filter(sideA).select(id.as("x"), vec.as("va"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
    val b = df.filter(!sideA).select(id.as("y"), vec.as("vb"))
    marginScore(
      a.crossJoin(b).select(col("x"), col("y"),
        floor(cosine(col("va"), col("vb")) * lit(1000000.0d) + lit(0.5d)).as("c")),
      k, topN)
  }

  /** The IVF-candidate form of [[marginMine]] — the 100 TB path: both
    * sides are k-means-assigned (fit on side A, `kCells` cells) and
    * only same-cell pairs are scored, so |pairs| ≈ Σ|A_cell|·|B_cell|
    * instead of |A|·|B|. With kCells ∝ corpus size the per-cell
    * populations — and the pairwise work — stay constant per unit of
    * data (the SemDeDup scaling discipline). Neighborhood averages are
    * then cell-local approximations of the global top-k; the margin
    * arithmetic itself is [[marginScore]], unchanged.
    */
  def cellMarginMine(df: DataFrame, id: Column, vec: Column, sideA: Column,
                     kCells: Int, iters: Int, k: Int, topN: Int): DataFrame = {
    val a = df.filter(sideA)
    val cents = kMeansFit(a, id, vec, kCells, iters)
    val aCell = kMeansAssign(a.select(id.as("id"), vec.as("v")), cents)
      .select(col("id").as("x"), col("v").as("va"), col("cell"))
    val bCell = kMeansAssign(df.filter(!sideA).select(id.as("id"), vec.as("v")), cents)
      .select(col("id").as("y"), col("v").as("vb"), col("cell"))
    marginScore(
      aCell.join(bCell, "cell").select(col("x"), col("y"),
        floor(cosine(col("va"), col("vb")) * lit(1000000.0d) + lit(0.5d)).as("c")),
      k, topN)
  }

  /** Margin scoring over an (x, y, c) candidate-pair frame, `c` the
    * micro-unit-quantized cosine. Shared by [[marginMine]] (exact A×B
    * pairs) and [[cellMarginMine]] (IVF-bounded pairs) — the scoring
    * never sees how candidates were generated.
    *
    * Deliberately TWO independent rank branches (x-window and
    * y-window each re-derive `pairs`), not one chained
    * rx-then-ry plan: the counter-measurement (2026-08-15, sf0.1,
    * same-session A/B) put the chained single-evaluation form at
    * 2.78 s vs 2.08 s for this one — regenerating the pair frame from
    * a broadcast cross join is cheaper than pushing the FULL pair
    * frame through a second chained exchange+sort, and ReuseExchange
    * already dedupes each branch's own re-reads. Revisit only if the
    * candidate generator stops being a cheap re-evaluation (e.g.
    * pairs arriving from an expensive upstream — checkpoint at the
    * CALLER in that case).
    */
  def marginScore(pairs: DataFrame, k: Int, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wx = Window.partitionBy(col("x")).orderBy(col("c").desc, col("y"))
    val wy = Window.partitionBy(col("y")).orderBy(col("c").desc, col("x"))
    val rx = pairs.withColumn("rx", row_number().over(wx))
    val axf = rx.filter(col("rx") <= k).groupBy(col("x"))
      .agg(sum(col("c")).as("ax"), count(lit(1)).as("nx"))
    val byf = pairs.withColumn("ry", row_number().over(wy))
      .filter(col("ry") <= k).groupBy(col("y"))
      .agg(sum(col("c")).as("bsum"), count(lit(1)).as("ny"))
    rx.filter(col("rx") === 1).drop("rx")
      .join(axf, "x").join(byf, "y")
      .filter(col("ax") * col("ny") + col("bsum") * col("nx") =!= 0L)
      .select(col("x"), col("y"),
        (col("c") / lit(1000000.0d)).as("cos_sim"),
        ((lit(2.0d) * col("c") * col("nx") * col("ny")) /
          (col("ax") * col("ny") + col("bsum") * col("nx")).cast("double")).as("margin"))
      .orderBy(col("margin").desc, col("x"), col("y"))
      .limit(topN)
  }
}
