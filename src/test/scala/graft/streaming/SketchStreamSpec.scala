package graft.streaming

import graft.SparkSpec
import graft.llm.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[SketchStream]] — streaming HLL registers must merge to the SAME
  * estimate as the batch sketch on the same rows, exactly: register
  * updates are monotone maxes, so arrival order, batching, and
  * duplication cannot move the result.
  */
class SketchStreamSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._
  import SketchStream.{Distinct, Estimate}

  test("kernel parity: JVM md5/rank equal the Column expressions") {
    val vals = (0 until 500).map(i => s"value_$i")
    val fromCols = vals.toDF("v")
      .select(col("v"), md5(col("v")).as("h"))
      .select(col("v"), substring(col("h"), 1, 2).as("b"),
        Sketches.hexRank(substring(col("h"), 3, 10), 10).as("r"))
      .as[(String, String, Int)].collect()
      .map { case (v, b, r) => v -> ((b, r)) }.toMap
    vals.foreach { v =>
      val h = SketchStream.md5Hex(v)
      assert((h.substring(0, 2), SketchStream.hexRank(h.substring(2, 12))) ==
        fromCols(v), s"kernel mismatch for $v")
    }
  }

  test("streaming estimate ≡ batch estimate, exactly, across batches and redelivery") {
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Distinct]
    val q = SketchStream.hllOf(in.toDS())
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("append").start()
    try {
      // two groups, values drip-fed across three triggers with overlap
      // (redelivered values) — registers must absorb all of it
      val g0 = (0 until 3000).map(i => Distinct(0L, s"a_$i"))
      val g1 = (0 until 120).map(i => Distinct(1L, s"b_$i"))
      in.addData(g0.take(1200) ++ g1.take(50)); q.processAllAvailable()
      in.addData(g0.slice(800, 2200) ++ g1)    ; q.processAllAvailable()
      in.addData(g0.drop(2000) ++ g1.take(7))  ; q.processAllAvailable()

      val streamEst = spark.table("hll_stream").as[Estimate].collect()
        .groupBy(_.group).map { case (g, rs) =>
          val fin = rs.maxBy(_.n_seen) // latest snapshot per key
          g -> ((fin.est, fin.v_zero))
        }

      val batch = Sketches.hllEstimate(
          (g0 ++ g1).toDF("group", "value"), col("group"), col("value"))
        .as[(Long, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

      assert(streamEst == batch,
        s"streaming registers must merge to the batch sketch: $streamEst vs $batch")
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("SpaceSaving top-k: hot keys guaranteed present, estimates bracket truth") {
    import SketchStream.{HeavyHitter, Occur}
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Occur]
    val m = 20
    val q = SketchStream.topKOf(in.toDS(), m)
      .writeStream.format("memory").queryName("ss_stream")
      .outputMode("append").start()
    try {
      // heavy head (k00 1000x, k01 500x, k02 300x) over a 77-key tail
      // of 20x each: n = 3340, n/m = 167, so the head is GUARANTEED
      // present while the tail churns through evictions — the
      // interesting regime. Interleaved, split across three triggers.
      val spec = Seq("k00" -> 1000, "k01" -> 500, "k02" -> 300) ++
        (3 until 80).map(i => f"k$i%02d" -> 20)
      val all = new scala.util.Random(7).shuffle(
        spec.flatMap { case (v, c) => Seq.fill(c)(Occur(0L, v)) }.toList)
      val n = all.size.toLong
      in.addData(all.take(1000));          q.processAllAvailable()
      in.addData(all.slice(1000, 2300));   q.processAllAvailable()
      in.addData(all.drop(2300));          q.processAllAvailable()

      // the live summary = the rows of the final trigger (max n_seen)
      val rows = spark.table("ss_stream").as[HeavyHitter].collect()
      assert(rows.map(_.n_seen).max == n, "final snapshot covers every arrival")
      val live = rows.filter(_.n_seen == n).map(h => h.value -> h).toMap
      assert(live.size == m, s"summary holds exactly m=$m entries")
      val truth = all.groupBy(_.value).view.mapValues(_.size.toLong).toMap
      // guarantee 1: every value with true count > n/m is in the live
      // summary (its counter can never become the minimum)
      val mustHave = truth.filter(_._2 > n / m).keySet
      assert(mustHave == Set("k00", "k01", "k02"), "fixture sanity")
      assert(mustHave.subsetOf(live.keySet),
        s"missing hot keys: ${mustHave -- live.keySet} (n=$n, n/m=${n / m})")
      // guarantee 2: count − err ≤ true ≤ count for every LIVE entry
      live.values.foreach { h =>
        val t = truth(h.value)
        assert(h.count - h.err <= t && t <= h.count,
          s"${h.value}: true=$t not in [${h.count - h.err}, ${h.count}]")
      }
      // the head estimates are exact: tracked from early, never evicted
      assert(live("k00").count == 1000L && live("k00").err == 0L)
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming KMV ≡ batch estimate exactly, duplicate- and redelivery-invariant") {
    import SketchStream.KmvEstimate
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Distinct]
    val q = SketchStream.kmvOf(in.toDS(), k = 64)
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("append").start()
    try {
      // group 0: 1500 distinct values (> k, estimator defined), with
      // duplicated and redelivered slices; group 1: 20 (< k)
      val g0 = (0 until 1500).map(i => Distinct(0L, s"a_$i"))
      val g1 = (0 until 20).map(i => Distinct(1L, s"b_$i"))
      in.addData(g0.take(600) ++ g1);          q.processAllAvailable()
      in.addData(g0.slice(300, 1100) ++ g1)  ; q.processAllAvailable() // overlap redelivery
      in.addData(g0.drop(1000) ++ g0.take(50)); q.processAllAvailable()

      // the live snapshot: n_mins grows until it saturates at k, then
      // u_k only shrinks — so max n_mins with min u_k is the latest
      val last = spark.table("kmv_stream").as[KmvEstimate].collect()
        .groupBy(_.group).map { case (g, rs) =>
          g -> rs.maxBy(r => (r.n_mins, -r.u_k))
        }
      val batch = graft.llm.Sketches.kmvKthMin(
          (g0 ++ g1).toDF("group", "value"), col("group"), col("value"), 64)
        .as[(Long, Double)].collect().toMap
      assert(last(0L).n_mins == 64 && last(0L).est == batch(0L),
        s"streaming ${last(0L)} vs batch ${batch(0L)}")
      assert(!batch.contains(1L) && last(1L).n_mins == 20 && last(1L).est == 0.0d,
        "below-k group: batch emits nothing, streaming reports the exact count")
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming count-min cells ≡ batch sketch across batches") {
    import SketchStream.{CmCell, Occur}
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Occur]
    val q = SketchStream.cmOf(in.toDS())
      .writeStream.format("memory").queryName("cm_stream")
      .outputMode("append").start()
    try {
      // two groups, occurrences with real duplicate values, split
      // across three triggers at arbitrary cut points
      val all = (0 until 2000).map(i => Occur(i % 2, s"tok_${i % 37}"))
      in.addData(all.take(700));      q.processAllAvailable()
      in.addData(all.slice(700, 1100)); q.processAllAvailable()
      in.addData(all.drop(1100));     q.processAllAvailable()

      // cells only grow → max per cell is the final sketch
      val streamed = spark.table("cm_stream").as[CmCell].collect()
        .groupBy(c => (c.group, c.r, c.b))
        .map { case (k, cs) => k -> cs.map(_.c).max }
      val batch = graft.llm.Sketches.countMin(
          all.map(o => (o.group, o.value)).toDF("g", "v"), col("g"), col("v"))
        .as[(Long, Long, String, Long)].collect()
        .map(r => ((r._1, r._2, r._3)) -> r._4).toMap
      assert(streamed == batch,
        "streaming cells must sum to the batch sketch exactly")
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming bloom gate: duplicates suppressed, word map ≡ batch build") {
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Distinct]
    val q = SketchStream.bloomFirstSeen(in.toDS())
      .writeStream.format("memory").queryName("bloom_stream")
      .outputMode("append").start()
    try {
      // 2000 distinct values arriving with heavy cross-trigger
      // duplication; every post-first occurrence must be suppressed
      val vals = (0 until 2000).map(i => Distinct(0L, s"v_$i"))
      in.addData(vals.take(900));                       q.processAllAvailable()
      in.addData(vals.slice(500, 1500) ++ vals.take(100)); q.processAllAvailable()
      in.addData(vals.drop(1400) ++ vals.slice(200, 300)); q.processAllAvailable()

      val out = spark.table("bloom_stream").as[SketchStream.FirstSeen].collect()
      val emitted = out.filter(_.emitted).map(_.value)
      assert(emitted.length == emitted.distinct.length,
        "a value must never be emitted twice (bits are monotone)")
      // FP-suppression is the only allowed loss, and at n=2000,
      // m=2^18 it is deterministic-and-tiny for this fixture
      assert(emitted.length >= 1990 && emitted.length <= 2000,
        s"emitted ${emitted.length} of 2000 distinct values")

      // mergeability: because a suppressed value's bits are already
      // covered, bloomBuild(emitted) must equal bloomBuild(all)
      def words(vs: Seq[String]) = graft.llm.Sketches.bloomBuild(
          vs.map((0L, _)).toDF("g", "v"), col("g"), col("v"))
        .select("w", "bits").as[(Long, Long)].collect().toSet
      assert(words(emitted.toSeq) == words(vals.map(_.value)),
        "streaming word state must merge to the batch sketch")
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming MAD estimator ≡ driver med/mad of the batch sample, order-free") {
    import SketchStream.{MadEst, Obs}
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Obs]
    val q = SketchStream.madOf(in.toDS(), k = 64)
      .writeStream.format("memory").queryName("mad_stream")
      .outputMode("append").start()
    try {
      val g0 = (0 until 500).map(i => Obs(0L, s"m_$i", (i * 97L) % 3001L))
      in.addData(scala.util.Random.shuffle(g0.take(300))); q.processAllAvailable()
      in.addData(g0.drop(200) ++ g0.take(50));             q.processAllAvailable()

      val live = spark.table("mad_stream").as[MadEst].collect()
        .maxBy(r => (r.n_sample, -r.h_k))
      // the expected sample, through the SAME batch aggregate
      val sv = g0.toDF("group", "rowKey", "v")
        .withColumn("h",
          conv(substring(md5(col("rowKey")), 1, 13), 16, 10).cast("long"))
        .groupBy("group")
        .agg(graft.functions.KmvAgg.kmvPairs(col("h"), col("v"), 64).as("vs"))
        .select("vs").as[Seq[Long]].head().sorted
      val med = sv((sv.size - 1) / 2)
      val mad = sv.map(v => math.abs(v - med)).sorted.apply((sv.size - 1) / 2)
      assert(live.n_sample == 64L && live.med_c == med && live.mad_c == mad,
        s"streaming $live vs batch (med=$med, mad=$mad)")
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming sampled quantiles ≡ the batch KmvPairsAgg sample, redelivery-invariant") {
    import SketchStream.{Obs, QuantileEst}
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Obs]
    val q = SketchStream.quantilesOf(in.toDS(), k = 64)
      .writeStream.format("memory").queryName("q_stream")
      .outputMode("append").start()
    try {
      // group 0: 1000 rows (> k — real sampling); group 1: 30 (< k —
      // degrades to exact quantiles of everything seen)
      val g0 = (0 until 1000).map(i => Obs(0L, s"r_$i", (i * 37L) % 10007L))
      val g1 = (0 until 30).map(i => Obs(1L, s"s_$i", i * 100L))
      in.addData(scala.util.Random.shuffle(g0.take(400) ++ g1)); q.processAllAvailable()
      in.addData(g0.slice(200, 800) ++ g1.take(10));             q.processAllAvailable()
      in.addData(scala.util.Random.shuffle(g0.drop(700) ++ g0.take(100)))
      q.processAllAvailable()

      val live = spark.table("q_stream").as[QuantileEst].collect()
        .groupBy(_.group).map { case (g, rs) =>
          g -> rs.maxBy(r => (r.n_sample, -r.h_k))
        }

      // batch twin through the ACTUAL KmvPairsAgg Column on all rows
      val batch = (g0 ++ g1).toDF("group", "rowKey", "v")
        .withColumn("h",
          conv(substring(md5(col("rowKey")), 1, 13), 16, 10).cast("long"))
        .groupBy("group")
        .agg(graft.functions.KmvAgg.kmvPairs(col("h"), col("v"), 64).as("vs"))
        .select(col("group"), col("vs")).as[(Long, Seq[Long])].collect()
        .map { case (g, vs) =>
          val sv = vs.sorted
          val n = sv.length
          def pick(num: Long, den: Long) = sv((((n - 1) * num) / den).toInt)
          g -> ((n.toLong, pick(1, 2), pick(9, 10), pick(99, 100)))
        }.toMap

      assert(live(0L).n_sample == 64L)
      assert((live(0L).n_sample, live(0L).p50c, live(0L).p90c, live(0L).p99c) == batch(0L),
        s"streaming ${live(0L)} vs batch ${batch(0L)}")
      assert(live(1L).n_sample == 30L)
      assert((live(1L).n_sample, live(1L).p50c, live(1L).p90c, live(1L).p99c) == batch(1L))
      // below-k group: the sample IS the population — exact quantiles
      assert(live(1L).p50c == ((30 - 1) / 2) * 100L)
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
