package graft.llm

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables

/** [[CorpusIo]] — JSONL corpus edge. Pins: lossless round-trip of the
  * documents table, declared-schema parsing (no inference pass),
  * corrupt lines to the error side-channel (not an abort, not a
  * silent drop), missing fields parse as nulls, and type violations
  * count as corrupt.
  */
class CorpusIoSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("corpusio").toString

  test("documents round-trip: write JSONL, read back, values identical") {
    val docs = Tables.documents(spark, sfDir)
    val dir = tmp()
    CorpusIo.writeJsonl(docs, dir)
    val (rows, errors) = CorpusIo.readJsonl(spark, dir)
    assert(errors.count() == 0)
    val a = docs.orderBy($"doc_id").collect().toSeq
    val b = rows.select(docs.columns.map(col): _*).orderBy($"doc_id").collect().toSeq
    assert(a == b)
  }

  test("corrupt and type-violating lines land in the error channel with raw text") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(dir, "part-0.jsonl"),
      Seq(
        """{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}""",
        """{"doc_id": oops not json""",
        """{"doc_id": "not-a-number", "text": "bad type"}""",
        """{"doc_id": 2, "text": "missing fields ok"}"""
      ).mkString("\n"))
    val (rows, errors) = CorpusIo.readJsonl(spark, dir)
    val got = rows.orderBy($"doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // missing fields parse as nulls (presence, not completeness)
    assert(got(1).isNullAt(got(1).fieldIndex("lang")))
    val errs = errors.collect().map(_.getString(0)).toSeq
    assert(errs.size == 2)
    assert(errs.exists(_.contains("oops not json")))
    assert(errs.exists(_.contains("not-a-number")))
  }

  test("blank and whitespace-only lines are countable errors, not phantom null rows") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(dir, "part-0.jsonl"),
      Seq(
        """{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}""",
        "",
        "   \t ",
        """{"doc_id": 2, "text": "ok2", "lang": "en", "source": "s", "n_chars": 3}"""
      ).mkString("\n"))
    val (rows, errors) = CorpusIo.readJsonl(spark, dir)
    // no all-null phantom rows leak through
    assert(rows.orderBy($"doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val errs = errors.collect().map(_.getString(0)).toSeq
    assert(errs.size == 2 && errs.forall(_.trim.isEmpty))
    // the streaming twin flags them the same way
    val q = CorpusIo.readJsonlStream(spark, dir)
      .writeStream.format("memory").queryName("jsonl_blank_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val s = spark.table("jsonl_blank_stream")
    assert(s.filter($"is_corrupt").count() == 2)
    assert(s.filter(!$"is_corrupt").count() == 2)
  }

  test("declared schema is required shape: corrupt column name collision refused") {
    intercept[IllegalArgumentException] {
      CorpusIo.readJsonl(spark, "/nonexistent",
        new org.apache.spark.sql.types.StructType()
          .add("__corrupt_record", org.apache.spark.sql.types.StringType))
    }
  }

  test("readJsonlStream: file-arrival ingest parses and flags corrupt lines") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(dir, "drop-0.jsonl"),
      Seq(
        """{"doc_id": 10, "text": "t", "lang": "en", "source": "s", "n_chars": 1}""",
        """garbage line"""
      ).mkString("\n"))
    val q = CorpusIo.readJsonlStream(spark, dir)
      .writeStream.format("memory").queryName("jsonl_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("jsonl_stream").orderBy($"is_corrupt").collect()
    assert(got.length == 2)
    assert(got(0).getLong(0) == 10L && !got(0).getBoolean(got(0).fieldIndex("is_corrupt")))
    assert(got(1).getBoolean(got(1).fieldIndex("is_corrupt")) &&
      got(1).getString(got(1).fieldIndex("raw_line")) == "garbage line")
  }

  test("writeJsonl emits one JSON object per line, shard count = partitions") {
    val dir = tmp()
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
      .repartition(2)
    CorpusIo.writeJsonl(df, dir)
    val shards = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-")).toSeq
    assert(shards.size == 2)
    val lines = shards.flatMap(f =>
      scala.io.Source.fromFile(f).getLines().toSeq)
    assert(lines.size == 3)
    lines.foreach(l => assert(l.startsWith("{") && l.endsWith("}")))
  }
}
