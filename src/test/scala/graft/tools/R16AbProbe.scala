package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llm.{Dedup, TextOps, TfIdf}

/** Round-16 interleaved A/Bs, one JVM, alternating variants — the
  * only protocol that survives this box's drift (canary swung
  * 0.34→0.80 within one hour this session; cross-process stash A/Bs
  * were unreadable).
  *
  *   ct:  llm_containment — shipped containmentPairs (numbered
  *        repartition on the digest before the window) vs the same
  *        pipeline WITHOUT the repartition (r15 shape, AQE coalesces
  *        the posting stages to 8 tasks).
  *   re:  llm_retrieval_eval — shipped wave-collapsed builder
  *        (dl as window on the tf frame, df rolled up from langDf)
  *        vs the r15 shape (separate df/dl aggregations + tf⋈dl
  *        join), inlined verbatim from commit a0c8aab.
  *
  * Run: R16AB=ct,re sbt "Test/runMain graft.tools.R16AbProbe"
  */
object R16AbProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val which = sys.env.getOrElse("R16AB", "ct,re").split(",").toSet
    val rounds = sys.env.getOrElse("R16AB_ROUNDS", "5").toInt

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.size / 2)
    }
    def ab(name: String, newF: () => Unit, oldF: () => Unit): Unit = {
      newF(); oldF() // warm
      val (ns, os) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
      for (_ <- 1 to rounds) { ns += time(newF); os += time(oldF) }
      val (nm, om) = (med(ns.result()), med(os.result()))
      println(f"[r16ab] $name%-4s new $nm%6.3f s  old $om%6.3f s  (${om / nm}%4.2fx)")
    }

    // ---------------------------------------------- llm_containment
    if (which("ct")) {
      def grams() = {
        val docs = Tables.fanOut(Tables.documents(spark, d))
          .filter(col("text").isNotNull).select(col("doc_id"), col("text"))
        val exc = docs
          .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
          .filter(col("doc_id") % 10 === 0 && size(col("ws")) >= 15)
          .select((col("doc_id") + 3000000L).as("doc_id"),
            expr("array_join(slice(ws, size(ws) div 3 + 1, size(ws) div 3), ' ')").as("text"))
        docs.unionByName(exc).select(col("doc_id"),
          explode(array_distinct(TextOps.wordNgrams(TextOps.words(col("text")), 5))).as("g"))
      }
      def ctNew(): Unit =
        noop(Dedup.containmentPairs(grams(), col("doc_id"), col("g"),
          assumeDistinct = true))
      // r15 shape: window straight off the kernel, AQE-coalescible
      def ctOld(): Unit = {
        val g = grams().select(col("doc_id").as("id"),
          md5(col("g").cast("string")).as("d"))
        val wd = Window.partitionBy(col("d"))
        val informative = g.withColumn("__df", count(lit(1)).over(wd))
          .filter(col("__df") <= 32L).localCheckpoint(false)
        val nA = informative.groupBy(col("id")).agg(count(lit(1)).as("n_a"))
        val pruned = informative.filter(col("__df") >= 2L)
        noop(pruned.select(col("d"), col("id").as("id_a"))
          .join(pruned.select(col("d"), col("id").as("id_b")), Seq("d"))
          .filter(col("id_a") =!= col("id_b"))
          .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("shared"))
          .join(nA.select(col("id").as("id_a"), col("n_a")), "id_a")
          .filter(col("shared") * lit(100L) >= lit(80L) * col("n_a"))
          .select(col("id_a"), col("id_b"), col("n_a"), col("shared"),
            (col("shared").cast("double") / col("n_a").cast("double"))
              .as("containment")))
      }
      ab("ct", () => ctNew(), () => ctOld())
    }

    // ------------------- incremental-dedup fingerprint kernel (r16)
    // prepare()'s kernel in isolation: (doc_id, digest, m0..m7)
    // deduped by digest — new = native MinHashSig single projection,
    // old = r15 d0-checkpoint + explode + 2×md5 + 8×min aggregate.
    if (which("mh")) {
      val k = 8
      def docs() = Tables.fanOut(Tables.documents(spark, d))
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      def uniq(fp: DataFrame, cols: Seq[String]): DataFrame =
        fp.groupBy(col("digest"))
          .agg(min_by(struct(cols.map(col): _*), col("doc_id")).as("__w"))
          .select(col("__w.*"))
      def mhNew(): Unit = {
        val fp = docs().select(col("doc_id"),
          TextOps.fingerprint(col("text")).as("digest"),
          graft.functions.MinHashSig.minHashSig(
            TextOps.wordNgrams(TextOps.words(col("text")), 3), k).as("__sig"))
        noop(uniq(fp, Seq("doc_id", "digest", "__sig"))
          .select((col("doc_id") +: col("digest") +:
            (0 until k).map(j => col("__sig").getItem(j).as(s"m$j"))): _*))
      }
      def mhOld(): Unit = {
        val d0 = docs().select(col("doc_id"), col("text"),
          TextOps.fingerprint(col("text")).as("digest")).localCheckpoint(true)
        val hashed = d0.select(col("doc_id"), col("digest"),
            explode_outer(TextOps.wordNgrams(TextOps.words(col("text")), 3)).as("sh"))
          .select(col("doc_id") +: col("digest") +:
            graft.llm.MinHashBridge.digests(col("sh")): _*)
        val aggs = first(col("digest")).as("digest") +: graft.llm.MinHashBridge.aggs(k)
        val fp = hashed.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
          .select((col("doc_id") +: col("digest") +:
            (0 until k).map(j => col(s"m$j"))): _*)
        noop(uniq(fp, fp.columns.toSeq))
      }
      ab("mh", () => mhNew(), () => mhOld())
    }

    // llm_minhash_lsh: shipped native-MinHashSig docsig vs the r15
    // explode + collect_list + 8×min aggregate docsig, identical
    // downstream (bands, candidate join, exact verify).
    if (which("lshq")) {
      def base() = {
        val docs = Tables.fanOut(Tables.documents(spark, d))
          .select(col("doc_id"), TextOps.words(col("text")).as("w"))
        val pert = docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 100000L).as("doc_id"),
            slice(col("w"), lit(1), greatest(size(col("w")) - 3, lit(0))).as("w"))
        docs.unionByName(pert)
          .withColumn("sh", TextOps.wordNgrams(col("w"), 3))
      }
      def lshNew(): Unit =
        noop(Dedup.minHashNearDups(base(), col("doc_id"), col("sh"), 8, 2, 0.5d))
      def lshOld(): Unit = {
        val k = 8
        val exploded = base()
          .select(col("doc_id").as("id"),
            explode_outer(array_distinct(col("sh"))).as("s"))
          .filter(col("s").isNotNull)
        val hashed = exploded.select(
          col("id") +: graft.llm.MinHashBridge.digests(col("s")): _*)
        val docsig = hashed.groupBy(col("id"))
          .agg(collect_list(col("__sh")).as("gs"),
            graft.llm.MinHashBridge.aggs(k): _*)
          .localCheckpoint(false)
        val cand = Dedup.lshCandidates(Dedup.lshBands(docsig, k, 2))
        val a = docsig.select(col("id").as("id_a"), col("gs").as("ga"))
        val b = docsig.select(col("id").as("id_b"), col("gs").as("gb"))
        noop(cand.join(a, "id_a").join(b, "id_b")
          .withColumn("na", size(col("ga"))).withColumn("nb", size(col("gb")))
          .withColumn("ninter", size(array_intersect(col("ga"), col("gb"))))
          .select(col("id_a"), col("id_b"),
            (col("ninter") * lit(1.0d) /
              (col("na") + col("nb") - col("ninter"))).as("jaccard"))
          .filter(col("jaccard") >= 0.5d))
      }
      ab("lshq", () => lshNew(), () => lshOld())
    }

    // llm_winnow: shipped (checkpoint before the total-order sort) vs
    // the r15 form whose range-sampling job re-ran the winnow kernel.
    if (which("wn")) {
      def wnDocs() = Tables.fanOut(Tables.documents(spark, d))
        .select(col("doc_id"), TextOps.normalize(col("text")).as("t"))
        .select(col("doc_id"),
          explode(array(
            graft.functions.WinnowSet.winnowSet(col("t"), 8, 4))).as("fps"))
        .filter(size(col("fps")) > 0)
        .select(col("doc_id"), size(col("fps")).cast("long").as("n_fp"),
          array_min(col("fps")).as("min_fp"), array_max(col("fps")).as("max_fp"))
      def wnNew(): Unit =
        noop(wnDocs().localCheckpoint(false).orderBy(col("doc_id")))
      def wnOld(): Unit = noop(wnDocs().orderBy(col("doc_id")))
      ab("wn", () => wnNew(), () => wnOld())
    }

    // llm_source_overlap: shipped (checkpointed source-set frame) vs
    // the r15 unbarriered form whose collect_set final aggregation
    // ran once per consumer.
    if (which("so")) {
      def soNew(): Unit =
        noop(graft.SparkEntry.queries("llm_source_overlap")(spark, d))
      def soOld(): Unit = {
        val sets = Tables.fanOut(Tables.documents(spark, d))
          .filter(col("text").isNotNull)
          .select(col("source").as("src"),
            explode(array_distinct(
              TextOps.wordNgrams(TextOps.words(col("text")), 5))).as("g"))
          .groupBy("g").agg(sort_array(collect_set(col("src"))).as("ss"))
          .select(col("ss"))
        val counts = sets.select(explode(col("ss")).as("src"))
          .groupBy("src").agg(count(lit(1)).as("cnt"))
        val inter = sets.filter(size(col("ss")) >= 2)
          .select(explode(flatten(transform(col("ss"), (a, i) =>
            transform(slice(col("ss"), i + 2, size(col("ss"))),
              b => struct(a.as("source_a"), b.as("source_b")))))).as("p"))
          .select(col("p.source_a").as("source_a"),
            col("p.source_b").as("source_b"))
          .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_shared"))
        noop(inter
          .join(counts.select(col("src").as("source_a"), col("cnt").as("na")), "source_a")
          .join(counts.select(col("src").as("source_b"), col("cnt").as("nb")), "source_b")
          .select(col("source_a"), col("source_b"), col("n_shared"),
            (col("n_shared").cast("double") /
              (col("na") + col("nb") - col("n_shared")).cast("double")).as("jaccard"),
            (col("n_shared").cast("double") /
              least(col("na"), col("nb")).cast("double")).as("containment"))
          .orderBy(col("source_a"), col("source_b")))
      }
      ab("so", () => soNew(), () => soOld())
    }

    // llm_edit_neardup: shipped native-MinHashSig signature vs the
    // r15 explode+agg signature, identical candidate + DP verify.
    if (which("ed")) {
      val k = 8
      def edBase() = {
        val docs = Tables.fanOut(Tables.documents(spark, d))
          .filter(col("text").isNotNull)
          .select(col("doc_id"), col("text"))
        val pert = docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 100000L).as("doc_id"),
            col("text").substr(lit(1),
              greatest(length(col("text")) - 25, lit(0))).as("text"))
        docs.unionByName(pert)
          .withColumn("sh", TextOps.wordNgrams(TextOps.words(col("text")), 3))
      }
      def edNew(): Unit =
        noop(Dedup.editNearDups(edBase(), col("doc_id"), col("text"),
          col("sh"), k, 2, 0.75d))
      def edOld(): Unit = {
        val base = edBase().select(col("doc_id").as("id"),
          col("text").as("t"), col("sh"))
        val exploded = base
          .select(col("id"), explode_outer(array_distinct(col("sh"))).as("s"))
          .filter(col("s").isNotNull)
        val hashed = exploded.select(
          col("id") +: graft.llm.MinHashBridge.digests(col("s")): _*)
        val sig = hashed.groupBy(col("id"))
          .agg(graft.llm.MinHashBridge.aggs(k).head,
            graft.llm.MinHashBridge.aggs(k).tail: _*)
        val cand = Dedup.lshCandidates(Dedup.lshBands(sig, k, 2))
          .repartition(spark.sparkContext.defaultParallelism)
        val ta = base.select(col("id").as("id_a"), col("t").as("ta"))
        val tb = base.select(col("id").as("id_b"), col("t").as("tb"))
        noop(cand.join(ta, "id_a").join(tb, "id_b")
          .withColumn("la", length(col("ta")))
          .withColumn("lb", length(col("tb")))
          .withColumn("maxlen", greatest(col("la"), col("lb")))
          .filter((col("maxlen") - abs(col("la") - col("lb")) + 1) * lit(1.0d)
            >= lit(0.75d) * col("maxlen"))
          .withColumn("dist", levenshtein(col("ta"), col("tb")))
          .withColumn("sim", lit(1.0d) - col("dist") * lit(1.0d) / col("maxlen"))
          .filter(col("sim") >= 0.75d)
          .select(col("id_a"), col("id_b"), col("dist"), col("sim")))
      }
      ab("ed", () => edNew(), () => edOld())
    }

    // (A full-llm_incremental_dedup A/B ran once via a temporary
    // graft.mh.legacy kernel toggle — new 3.595 s vs old 4.288 s,
    // 1.19x, recorded in SCALE.md r16 — and the toggle was then
    // removed from the operator; the `mh` case above keeps the
    // kernel-level baseline reproducible.)

    // ------------------------------------------- llm_retrieval_eval
    if (which("re")) {
      def reNew(): Unit =
        noop(graft.SparkEntry.queries("llm_retrieval_eval")(spark, d))
      val discountQ: Seq[Long] = Seq(
        1000000000L, 630929754L, 500000000L, 430676558L, 386852807L,
        356207187L, 333333333L, 315464877L, 301029996L, 289064826L)
      val idcgPrefix: Seq[Long] = discountQ.scanLeft(0L)(_ + _).tail
      // r15 shape, inlined verbatim from a0c8aab
      def reOld(): Unit = {
        val s = spark
        val docs = Tables.fanOut(Tables.documents(s, d))
          .select(col("doc_id"), col("lang"), TextOps.words(col("text")).as("ws"))
        val tf = TfIdf.termFreq(docs.select(col("doc_id"), col("ws")),
          col("doc_id"), col("ws")).localCheckpoint(false)
        val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
        val dl = tf.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
        val totR = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl")).head()
        val nDocs = totR.getLong(0)
        val sumdl = if (totR.isNullAt(1)) 0L else totR.getLong(1)
        val docLang = Tables.documents(s, d)
          .select(col("doc_id").as("id"), col("lang"))
        val langDf = tf.select(col("id"), col("w")).join(docLang, "id")
          .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("ldf"))
        val qTerms = langDf
          .withColumn("__rk", row_number().over(
            Window.partitionBy(col("lang")).orderBy(col("ldf").desc, col("w"))))
          .filter(col("__rk") <= 3).select(col("lang"), col("w"))
          .join(broadcast(df), "w")
        val perTerm = tf.join(broadcast(qTerms), "w")
          .join(dl, "id")
          .withColumn("__qs", floor(
            log(lit(1.0d) + (lit(nDocs) - col("df") + lit(0.5d))
              / (col("df") + lit(0.5d)))
              * (col("tf") * (lit(1.2d) + lit(1.0d)))
              / (col("tf") + lit(1.2d) * (lit(1.0d) - lit(0.75d)
                + lit(0.75d) * col("dl")
                / (lit(sumdl).cast("double") / lit(nDocs).cast("double"))))
              * lit(1000000.0d)).cast("long"))
          .groupBy(col("lang"), col("id"))
          .agg(sum(col("__qs")).as("score"))
        val top10 = perTerm
          .withColumn("rank", row_number().over(
            Window.partitionBy(col("lang")).orderBy(col("score").desc, col("id"))))
          .filter(col("rank") <= 10)
          .join(Tables.documents(s, d)
            .select(col("doc_id").as("id"), col("lang").as("__dlang")), "id")
          .withColumn("rel", (col("__dlang") === col("lang")).cast("long"))
        val relTotal = docs.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_rel_corpus"))
        val dArr = array(discountQ.map(lit): _*)
        val pArr = array(idcgPrefix.map(lit): _*)
        noop(top10.groupBy(col("lang"))
          .agg(sum(col("rel")).as("__nrel"),
            min(when(col("rel") === 1L, col("rank"))).as("__firstrel"),
            sum(when(col("rel") === 1L,
              element_at(dArr, col("rank").cast("int"))).otherwise(0L)).as("__dcgq"))
          .join(broadcast(relTotal), "lang")
          .select(col("lang"), col("n_rel_corpus"),
            (col("__nrel").cast("double") / lit(10.0d)).as("p_at_10"),
            when(col("__firstrel").isNotNull,
              lit(1.0d) / col("__firstrel").cast("double")).as("mrr_at_10"),
            (col("__dcgq").cast("double")
              / element_at(pArr, least(col("n_rel_corpus"), lit(10L)).cast("int"))
                .cast("double")).as("ndcg_at_10"))
          .orderBy(col("lang")))
      }
      ab("re", () => reNew(), () => reOld())
    }
    spark.stop()
  }
}
