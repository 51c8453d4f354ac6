package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Additive schema evolution on TxTable appends (the public Delta
  * mergeSchema contract) + explicit-schema snapshot reads.
  */
class TxSchemaEvolutionSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def table() = new TxTable(spark,
    java.nio.file.Files.createTempDirectory("txevo").toString)

  test("widened append: old files read the new column as null") {
    val t = table()
    t.append(Seq((1L, "a", "2021-01-01"), (2L, "b", "2021-01-01"))
      .toDF("id", "v", "p_date"))
    t.append(Seq((3L, "c", 30L, "2021-01-02"))
      .toDF("id", "v", "extra", "p_date"))

    val got = t.read()
    assert(got.schema.fieldNames.toSeq == Seq("id", "v", "extra", "p_date"))
    val rows = got.select("id", "extra").as[(Long, Option[Long])]
      .collect().toMap
    assert(rows == Map(1L -> None, 2L -> None, 3L -> Some(30L)))
  }

  test("narrow append after widening: the table schema keeps the wide column") {
    val t = table()
    t.append(Seq((1L, "a", 10L, "2021-01-01")).toDF("id", "v", "extra", "p_date"))
    // an old-schema writer appends WITHOUT the column — it must not
    // shrink the table
    t.append(Seq((2L, "b", "2021-01-01")).toDF("id", "v", "p_date"))
    val got = t.read()
    assert(got.schema.fieldNames.contains("extra"))
    assert(got.filter(col("id") === 2L).select("extra")
      .as[Option[Long]].head().isEmpty)
    assert(got.filter(col("id") === 1L).select("extra")
      .as[Option[Long]].head().contains(10L))
  }

  test("type conflict on a shared column fails loudly") {
    val t = table()
    t.append(Seq((1L, "a", "2021-01-01")).toDF("id", "v", "p_date"))
    val e = intercept[IllegalArgumentException] {
      t.append(Seq((2L, 99L, "2021-01-01")).toDF("id", "v", "p_date"))
    }
    assert(e.getMessage.contains("schema conflict on 'v'"))
  }

  test("time travel reads each version under its own committed schema") {
    val t = table()
    val v0 = t.append(Seq((1L, "a", "2021-01-01")).toDF("id", "v", "p_date"))
    t.append(Seq((2L, "b", 20L, "2021-01-02")).toDF("id", "v", "extra", "p_date"))
    val old = t.readSnapshot(t.snapshot(v0))
    assert(!old.schema.fieldNames.contains("extra"),
      "the v0 snapshot predates the column")
    assert(old.count() === 1L)
    assert(t.read().count() === 2L)
  }

  test("evolution composes with stats pruning and partition reads") {
    val t = new TxTable(spark,
      java.nio.file.Files.createTempDirectory("txevo2").toString,
      statsCols = Seq("id"))
    t.append((1L to 50L).map(i => (i, s"v$i", "a")).toDF("id", "v", "p_date")
      .coalesce(1))
    t.append((100L to 150L).map(i => (i, s"v$i", i * 2, "a"))
      .toDF("id", "v", "extra", "p_date").coalesce(1))
    // prune to the second (widened) file only; the read carries extra
    val pruned = t.readPruned(Map("id" -> ((100L, 150L))))
    assert(pruned.schema.fieldNames.contains("extra"))
    assert(pruned.count() === 51L)
    assert(t.pruneFiles(t.snapshot(t.version).files,
      Map("id" -> ((100L, 150L)))).size === 1)
  }
}
