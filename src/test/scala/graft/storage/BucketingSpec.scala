package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-located joins/aggregations on bucketed tables plan with ZERO
  * shuffle exchanges — the layout-level scale win [[Bucketing]]
  * exists for. Broadcast is disabled inside the test so the join
  * can't dodge the question.
  */
class BucketingSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange hashpartitioning"))

  private def withNoBroadcast[A](f: => A): A = {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("same-bucket-count join and keyed groupBy plan with zero exchanges") {
    val a = (1L to 1000L).map(i => (i % 97, i)).toDF("k", "va")
    val b = (1L to 500L).map(i => (i % 89, i * 2)).toDF("k", "vb")
    Bucketing.writeBucketed(a, "bkt_a", "k", 8)
    Bucketing.writeBucketed(b, "bkt_b", "k", 8)
    try {
      val ta = Bucketing.readBucketed(spark, "bkt_a")
      val tb = Bucketing.readBucketed(spark, "bkt_b")
      withNoBroadcast {
        val joined = ta.join(tb, "k")
        assert(shuffles(joined) === 0,
          s"bucketed join should not shuffle:\n${joined.queryExecution.executedPlan}")
        // same rows as the unbucketed join
        assert(joined.count() ===
          a.join(b, "k").count())
        val agg = ta.groupBy("k").agg(sum("va"))
        assert(shuffles(agg) === 0,
          s"bucketed groupBy should not shuffle:\n${agg.queryExecution.executedPlan}")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("unbucketed baseline DOES shuffle (the exchange the layout removes)") {
    val a = (1L to 200L).map(i => (i % 7, i)).toDF("k", "va")
    val b = (1L to 200L).map(i => (i % 7, i * 2)).toDF("k", "vb")
    withNoBroadcast {
      assert(shuffles(a.join(b, "k")) > 0)
    }
  }
}
