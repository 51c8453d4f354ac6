package graft.tools

import org.apache.spark.sql.SparkSession

/** Expensive-expression duplication audit. Predicate substitution and
  * project collapse can re-inline a costly expression at every
  * reference site (the cdcChunks / unitNovelty / editNearDups lesson,
  * caught three times by hand); this tool counts occurrences of the
  * known-expensive function tokens in every catalog query's OPTIMIZED
  * plan so the next duplication is caught by reading one report
  * instead of profiling one slow query.
  *
  * Counts are not violations by themselves — minhash legitimately
  * evaluates k seeded md5 aggregates, and a self-join legitimately
  * plans its subtree twice (exchange reuse dedups at execution). The
  * report exists to make the NUMBERS visible so a 3x-per-reference
  * inflation (like the levenshtein one: 3 copies for one logical
  * call) stands out against the query's known geometry.
  *
  * Usage: Test/runMain graft.tools.DupExprAudit [query...]
  */
object DupExprAudit {
  /** Function-CALL regexes matching how each expression renders in a
    * plan string: native case classes print their lowercased class
    * name (`WinnowSet` → `winnowset(...)`), not their SQL-registered
    * name — matching `winnow_set` finds nothing.
    */
  val ExpensiveTokens: Seq[String] = Seq(
    "levenshtein\\(", "winnowset\\(", "charngramset\\(",
    "cdcgearchunks\\(", "nfcnormalize\\(", "account\\(",
    "regexp_replace\\(", "regexp_extract_all\\(", "from_json\\(",
    "inflate\\(")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val names =
      if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try {
        val plan = graft.SparkEntry.queries(n)(spark, d)
          .queryExecution.optimizedPlan.toString.toLowerCase
        val counts = ExpensiveTokens
          .map(t => t.stripSuffix("\\(") -> t.r.findAllIn(plan).length)
          .filter(_._2 > 0)
        if (counts.nonEmpty)
          println(f"$n%-26s " + counts.map { case (t, c) => s"$t=$c" }.mkString(" "))
      } catch {
        case e: Exception => println(f"$n%-26s ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
