package graft.core

import graft.SparkSpec
import org.apache.spark.sql.types._

class TablesSpec extends SparkSpec {
  test("all driver tables load and are non-empty") {
    Tables.All.foreach { name =>
      val df = Tables.load(spark, sfDir, name)
      assert(df.count() > 0, s"$name is empty")
    }
  }

  test("events.ts reads as a timestamp-compatible type") {
    val df = Tables.events(spark, sfDir)
    val t = df.schema("ts").dataType
    assert(t == TimestampType || t.typeName.contains("timestamp"), s"got $t")
    df.select("ts").show(3, truncate = false)
  }

  test("eventSeries has unique (event_type, ts)") {
    val s = Tables.eventSeries(spark, sfDir)
    assert(s.count() == s.dropDuplicates("event_type", "ts").count())
  }
}
