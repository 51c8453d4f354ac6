package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus ingestion/export — the interchange format every
  * web-scale curation pipeline speaks (one JSON document per line,
  * optionally .gz/.zst per file; CommonCrawl derivatives, RedPajama,
  * Dolma all ship this shape). Parquet stays the engine's working
  * format; this is the edge.
  *
  * Scale discipline:
  *  - The schema is DECLARED, never inferred: `spark.read.json`
  *    without a schema runs a full extra inference pass over the
  *    corpus before the real scan — at 100 TB that doubles the
  *    ingest read. Callers pass their contract (default: the
  *    `documents` table shape).
  *  - Malformed lines go to a SIDE-CHANNEL, not an abort and not a
  *    silent drop: PERMISSIVE mode + a corrupt-record column, split
  *    into (rows, errors) — the `ohlcvs_errors` discipline
  *    (reference fetchers/rest.py error rows) applied to corpus
  *    ingest. One bad crawler shard must not kill a week-long job,
  *    and dropped rows must be countable.
  *  - Line-split parallelism is free: JSONL is splittable by
  *    newline (uncompressed) and parallel by FILE when gzipped, so
  *    sharded .jsonl.gz corpora scan wide with no extra work.
  */
object CorpusIo {

  /** The `documents` table contract (driver testdata shape). */
  val documentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val corruptCol = "__corrupt_record"

  /** Read a JSONL corpus under a declared schema. Returns
    * (rows, errors): `rows` carries exactly `schema`'s columns for
    * every well-formed line; `errors` carries the raw text of every
    * line that failed to parse AS THE DECLARED TYPES (malformed JSON,
    * or a field whose value can't take the declared type). A line
    * that is valid JSON but misses fields parses with nulls — schema
    * presence, not completeness, is the parse contract (exactly
    * Spark's PERMISSIVE semantics; enforce NOT NULL downstream where
    * the pipeline needs it).
    */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType = documentSchema): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema may not contain $corruptCol")
    // text scan + from_json, NOT the json datasource: the datasource
    // refuses plans that project only its corrupt-record column
    // (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), which is
    // exactly what the error sink does. The text source line-splits
    // identically (JSONL is newline-framed by definition), the parse
    // is the same JacksonParser, and the raw line is naturally in
    // hand for the error channel.
    val withCorrupt = schema.add(StructField(corruptCol, StringType))
    val parsed = spark.read.textFile(path).toDF("raw_line")
      .select(col("raw_line"),
        from_json(col("raw_line"), withCorrupt,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> corruptCol)).as("j"))
    // A blank/whitespace-only line parses to a NULL struct (the
    // JacksonParser emits no row, so the corrupt column is null too):
    // it must route to errors, not become an all-null phantom row —
    // "malformed lines are countable errors, never a silent drop".
    val wellFormed = col("j").isNotNull && col(s"j.$corruptCol").isNull
    val rows = parsed.filter(wellFormed)
      .select(schema.fieldNames.map(f => col(s"j.$f").as(f)): _*)
    val errors = parsed.filter(!wellFormed)
      .select(col("raw_line"))
    (rows, errors)
  }

  /** Streaming twin of [[readJsonl]] for incremental corpus drops
    * (new .jsonl shards landing in a directory, feeding e.g.
    * [[IncrementalDedup]].admit): same declared-schema parse, same
    * error contract, one frame — streaming sources can't fan out to
    * two cheap frames, so corrupt routing is a `is_corrupt` flag plus
    * the raw line, and callers split inside their sink (foreachBatch)
    * where both halves share the micro-batch read. `maxFilesPerTrigger`
    * is the caller's backpressure knob via options.
    */
  def readJsonlStream(spark: SparkSession, path: String,
                      schema: StructType = documentSchema,
                      options: Map[String, String] = Map.empty): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema may not contain $corruptCol")
    val withCorrupt = schema.add(StructField(corruptCol, StringType))
    spark.readStream.options(options).text(path)
      .select(col("value").as("raw_line"),
        from_json(col("value"), withCorrupt,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> corruptCol)).as("j"))
      .select(
        (schema.fieldNames.map(f => col(s"j.$f").as(f)) :+
          // NULL struct (blank line) is corrupt too — see readJsonl.
          (col("j").isNull || col(s"j.$corruptCol").isNotNull)
            .as("is_corrupt") :+
          col("raw_line")): _*)
  }

  /** Write a frame as JSONL shards (one JSON object per line, one
    * file per partition — the sharded layout downstream tokenizers
    * expect). Column order follows the frame; nulls are omitted by
    * to_json (standard JSONL practice). Pass a repartitioned frame to
    * control shard count/size.
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
      .write.mode("overwrite").text(path)

  /** Blob-of-WARC-files → the [[documentSchema]] frame + the
    * is_corrupt/raw_line error contract of [[readJsonlStream]]:
    * response records split ([[WebOps.warcRecords]]), the HTML
    * payload reduced to visible text, and the curation keys derived
    * from the record's own URI —
    *
    *  - `doc_id` = xxhash64 of the CANONICAL URL, so a recrawl of the
    *    same page maps to the same id and exact dedup collapses it
    *    without any crawler-side coordination;
    *  - `source` = registered domain of the canonical URL (the
    *    blocklist/quota/profile key downstream stages group on);
    *  - `lang` = null — language ID is a downstream scorer
    *    ([[TextOps.langId]]), not an ingest guess;
    *  - `n_chars` over the EXTRACTED text.
    *
    * A record with no `WARC-Target-URI` or an empty extraction is
    * routed as corrupt with the record head as `raw_line` (truncated:
    * a multi-MB payload must not ride the error table).
    */
  private def warcToDocs(blobs: DataFrame): DataFrame = {
    val canon = WebOps.canonicalUrl(col("uri"))
    blobs
      .select(explode(WebOps.warcRecords(col("value"))).as("rec"))
      .select(col("rec"),
        WebOps.warcHeader(col("rec"), "WARC-Target-URI").as("uri"))
      .select(col("rec"), col("uri"),
        WebOps.htmlText(WebOps.warcHttpBody(col("rec"))).as("text"))
      .select(
        xxhash64(canon).as("doc_id"),
        col("text"),
        lit(null).cast(StringType).as("lang"),
        WebOps.registeredDomain(WebOps.urlHost(canon)).as("source"),
        length(col("text")).cast(LongType).as("n_chars"),
        (col("uri") === "" || col("text") === "").as("is_corrupt"),
        substring(col("rec"), 1, 4096).as("raw_line"))
  }

  /** Batch WARC ingest: every file under `path` read whole (the
    * parallel unit is the FILE — a crawl distribution is thousands of
    * ~1 GB WARCs, which is exactly the wide-scan shape) and reduced
    * by [[warcToDocs]].
    */
  def readWarc(spark: SparkSession, path: String): DataFrame =
    warcToDocs(spark.read.option("wholetext", "true").text(path))

  /** Streaming twin of [[readWarc]] for incremental crawl drops (new
    * .warc files landing in a directory) — same frame, same error
    * contract; feed it to [[CuratePipeline.processBatch]] exactly
    * like the JSONL stream. `maxFilesPerTrigger` is the caller's
    * backpressure knob via options.
    */
  def readWarcStream(spark: SparkSession, path: String,
                     options: Map[String, String] = Map.empty): DataFrame =
    warcToDocs(
      spark.readStream.options(options).option("wholetext", "true").text(path))
}
