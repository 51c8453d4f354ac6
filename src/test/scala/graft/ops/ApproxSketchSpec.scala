package graft.ops

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** The documented 100 TB scale paths for exact aggregates — HLL++
  * (`approx_count_distinct`) for distincts and t-digest
  * (`approx_percentile`) for quantiles — measured against their exact
  * twins on real testdata. These sketches are constant-size and
  * mergeable (map-side combinable), which is why they replace the
  * exact forms when key cardinality or group width explodes; the spec
  * pins the error actually observed so "approx is fine at scale"
  * stays a measured claim, not a hope.
  */
class ApproxSketchSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, sfDir)

  test("approx_count_distinct(rsd=0.02) lands within 5% of exact on users-per-type") {
    val rows = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (e, a) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e <= 0.05,
        s"${r.getString(0)}: approx $a vs exact $e drifts > 5%")
    }
  }

  test("approx_percentile(accuracy=10000) matches exact percentile on cents exactly") {
    // at this accuracy the t-digest holds every distinct value for
    // sf0.001-sized groups: the sketch degrades to exact, which pins
    // the plumbing; the scale win is that its size stays bounded as
    // rows grow
    val c = floor(col("value") * 100 + 0.5)
    val rows = events.groupBy("event_type")
      .agg(percentile(c, lit(0.5)).as("exact"),
        percentile_approx(c, lit(0.5), lit(10000)).as("approx"))
      .collect()
    rows.foreach { r =>
      val (e, a) = (r.getDouble(1), r.getLong(2).toDouble)
      // approx returns an actual data value; exact interpolates —
      // they may differ by at most one inter-value step
      assert(math.abs(a - e) <= math.abs(e) * 0.01 + 100,
        s"${r.getString(0)}: approx $a vs exact $e")
    }
  }
}
