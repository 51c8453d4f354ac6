package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The leakage property `llm_split_assign` exists for: every member
  * of a near-dup cluster lands in the SAME split, and the hash
  * threshold actually produces a ~90/10 partition.
  */
class SplitAssignSpec extends SparkSpec {

  test("near-dup cluster members never straddle the split; ratio tracks 90/10") {
    val out = graft.SparkEntry.queries("llm_split_assign")(spark, sfDir)
      .persist()
    try {
      assert(out.groupBy("cluster").agg(countDistinct("split").as("k"))
        .filter(col("k") > 1).count() === 0,
        "a near-dup cluster straddles train/val — eval leakage")
      // the fixture's constructed near-dups form real multi-member clusters
      assert(out.groupBy("cluster").count().filter(col("count") > 1).count() > 0)
      val n = out.count().toDouble
      val train = out.filter(col("split") === "train").count().toDouble
      assert(train / n > 0.75 && train / n < 0.98, s"split ratio ${train / n}")
    } finally out.unpersist()
  }
}
