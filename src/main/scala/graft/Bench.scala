package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every catalog query on
  * SPARK_GRAFT_SF_DIR, forcing full plan execution via the noop sink
  * (a bare count() would let Catalyst prune projected expressions),
  * and prints ONE JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // JVM/codegen warmup outside the timings (driver measures wall
    // clock per query; class-loading noise would land on the first).
    // Non-fatal: a warmup failure (e.g. a testdata schema change) must
    // not zero out the round's entire performance evidence — round 9
    // lost its bench to exactly that. Root cause goes to stderr first
    // so a truncated log tail still identifies it.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed: ${rootLine(e)}")
    }

    // Noise hygiene (round-2 verdict: a shared box inflated untouched
    // sub-second queries 2-3x between rounds): run the whole catalog
    // `rounds` times INTERLEAVED — a load spike lands on one round of
    // many queries instead of one query's only sample — and report the
    // per-query MEDIAN. Measured at sf0.1: 3 rounds left 12/38 queries
    // >10% apart across two invocations; 5 rounds leaves 3/38, all
    // within 0.14s absolute (the box's scheduler floor).
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "5").toInt
    // Local-iteration escape hatch: bench a comma-separated subset.
    // The driver never sets it, so round benches always run the full
    // catalog.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    val errors  = scala.collection.mutable.Map.empty[String, String]
    for (_ <- 1 to rounds; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${rootLine(e)}")
        errors(name) = rootLine(e)
      }
      samples.updateWith(name)(s => Some((System.nanoTime() - t0) / 1e9 :: s.getOrElse(Nil)))
    }
    def median(xs: List[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val results = names.map(n => n -> median(samples(n)))
    // The per-query session floor — plan + job scheduling through the
    // same noop sink on a trivial input — measured with the same
    // median-of-rounds discipline. BENCH_COMPARE nets it out so
    // sub-second queries' plan ratios aren't drowned by fixed cost.
    val floor = median((1 to rounds).map { _ =>
      val t0 = System.nanoTime()
      spark.range(32).repartition(2).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.toList)
    // Locale.ROOT: %.3f under a comma-decimal default locale would
    // emit malformed JSON.
    def f3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => s""""$k":${f3(v)}""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Failed queries are called out IN the artifact (name → root-cause
    // first line) — a bench with errors must not read as a clean run.
    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\n\\r\\t]", " ") + "\""
    val errField =
      if (errors.isEmpty) ""
      else errors.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":${jstr(v.take(300))}""" }
        .mkString(""","errors":{""", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"floor":${f3(floor)},"sf":"$sfDir","rounds":$rounds$errField}"""
    println(fullLine)
    // The full per-query line outgrew the driver's tail capture at 136
    // queries (the round-10 artifact recorded rc=0 but parsed=null), so
    // ALSO: (a) persist the full line to a file for bench_compare.py and
    // the round record, and (b) print a compact summary LAST — small
    // enough that a truncated tail always ends with one parseable line.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_JSON", "/tmp/graft_bench_full.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      (fullLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${rootLine(e)}")
    }
    val slowest = results.sortBy(-_._2).take(8)
      .map { case (k, v) => s""""$k":${f3(v)}""" }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","nqueries":${results.size},"floor":${f3(floor)},"sf":"$sfDir","rounds":$rounds,"nerrors":${errors.size},"slowest":$slowest,"full":"$outPath"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }

  /** First line of the ROOT cause — the `DATATYPE_MISMATCH ...` line,
    * not 30 frames of analyzer scaffolding (round-9 bench tail lost
    * the message to truncation).
    */
  private def rootLine(e: Throwable): String = {
    var t = e
    while (t.getCause != null && t.getCause != t) t = t.getCause
    val msg = Option(t.getMessage).getOrElse(t.getClass.getName)
    s"${t.getClass.getSimpleName}: ${msg.linesIterator.take(3).mkString(" | ")}"
  }
}
