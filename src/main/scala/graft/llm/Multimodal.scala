package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, processed by partition-batched decoders — the
  * Scala/Tungsten analog of `mapInPandas` batch UDFs.
  *
  * The actual codecs (image/audio/video decode) are NOT available in
  * this environment, so [[StubDecoder]] provides a deterministic fake;
  * the Spark-side contract — schema, partitioning, batch iteration,
  * failure isolation — is real and tested. Swapping in a real decoder
  * is a one-class change (implement [[MediaDecoder]]).
  *
  * Scale notes: decode runs inside `mapPartitions`, so the cost is
  * embarrassingly parallel and batched per partition (no per-row JNI
  * or process churn). At 100 TB keep media in its own column family /
  * parquet files (columnar pruning skips the bytes unless selected)
  * and size `spark.sql.files.maxPartitionBytes` so a partition of
  * blobs fits executor memory.
  */
object Multimodal {

  /** Per-blob features a decoder extracts. `ok=false` rows carry the
    * error message instead of failing the job (error-sink pattern,
    * reference fetchers append failures to `ohlcvs_errors` — SURVEY S10).
    */
  case class MediaFeatures(
      n_bytes: Long, digest: String, width: Int, height: Int,
      ok: Boolean, error: String)

  trait MediaDecoder extends Serializable {
    def decode(bytes: Array[Byte]): MediaFeatures
  }

  /** Deterministic stand-in for the real codec: digest is md5 of the
    * bytes; "dimensions" are derived from the digest so tests have
    * stable, data-dependent values.
    */
  class StubDecoder extends MediaDecoder {
    override def decode(bytes: Array[Byte]): MediaFeatures = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(bytes).map("%02x".format(_)).mkString
      MediaFeatures(
        n_bytes = bytes.length.toLong,
        digest = hex,
        width = java.lang.Integer.parseInt(hex.substring(0, 2), 16),
        height = java.lang.Integer.parseInt(hex.substring(2, 4), 16),
        ok = true, error = "")
    }
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("digest", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("ok", BooleanType, nullable = false),
    StructField("error", StringType, nullable = false)))

  /** Decode a binary column into feature columns, batched per
    * partition. Keeps `idCols` pass-through; appends featureSchema.
    */
  def extractFeatures(df: DataFrame, binCol: String, idCols: Seq[String],
                      decoder: MediaDecoder = new StubDecoder): DataFrame = {
    val in = df.select((idCols :+ binCol).map(col): _*)
    val outSchema = StructType(
      idCols.map(in.schema(_)) ++ featureSchema.fields)
    val enc = RowEncoder.encoderFor(outSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binCol)
        val f =
          try decoder.decode(bytes)
          catch { case e: Exception =>
            MediaFeatures(if (bytes == null) 0L else bytes.length.toLong,
              "", 0, 0, ok = false, String.valueOf(e.getMessage))
          }
        Row.fromSeq(idCols.map(r.getAs[Any]) ++
          Seq(f.n_bytes, f.digest, f.width, f.height, f.ok, f.error))
      }
    }(enc)
  }
}
