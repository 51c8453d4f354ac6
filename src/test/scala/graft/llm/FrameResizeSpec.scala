package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Multimodal.frameSample]] and [[Multimodal.resize]] — the video
  * demux and thumbnail slots: frame boundaries, sampling stride,
  * partial-frame drop, mean binning, letterboxing, error isolation.
  */
class FrameResizeSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def blob(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray

  test("frameSample: exact boundaries, stride, partial-frame drop") {
    // 10 bytes, 4-byte frames -> frames [0..3], [4..7]; byte 8,9 dropped
    val df = Seq((1L, blob(0, 1, 2, 3, 4, 5, 6, 7, 8, 9))).toDF("doc_id", "blob")
    val all = Multimodal.frameSample(df, "blob", Seq("doc_id"), 4, 1)
      .orderBy("frame_idx").collect()
    assert(all.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 1))
    assert(all(0).getAs[Array[Byte]]("frame").toSeq === blob(0, 1, 2, 3).toSeq)
    assert(all(1).getAs[Array[Byte]]("frame").toSeq === blob(4, 5, 6, 7).toSeq)

    val strided = Multimodal.frameSample(df, "blob", Seq("doc_id"), 2, 2)
      .orderBy("frame_idx").collect()
    assert(strided.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 2, 4),
      "every 2nd of frames 0..4")
    assert(strided(1).getAs[Array[Byte]]("frame").toSeq === blob(4, 5).toSeq)
  }

  test("frameSample: a failing blob yields one error row, others unaffected") {
    val df = Seq((1L, blob(1, 2, 3, 4)), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "blob")
    val out = Multimodal.frameSample(df, "blob", Seq("doc_id"), 4, 1).collect()
    val good = out.filter(_.getAs[Boolean]("ok"))
    val bad = out.filterNot(_.getAs[Boolean]("ok"))
    assert(good.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L))
    assert(bad.map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("frame_idx"))).toSeq
      === Seq((2L, -1)))
  }

  test("resize: integer cell means, hand-computed") {
    // n=4, 2x1 grid: cells {0,2}->cell0 mean 1, {4,6}->cell1 mean 5
    val df = Seq((1L, blob(0, 2, 4, 6))).toDF("doc_id", "blob")
    val out = Multimodal.resize(df, "blob", Seq("doc_id"), 2, 1).collect()
    assert(out.head.getAs[Array[Byte]]("thumb").toSeq === blob(1, 5).toSeq)
  }

  test("resize: undersized blob letterboxes unreached cells to 0") {
    val df = Seq((1L, blob(10))).toDF("doc_id", "blob")
    val out = Multimodal.resize(df, "blob", Seq("doc_id"), 2, 2).collect()
    assert(out.head.getAs[Array[Byte]]("thumb").toSeq === blob(10, 0, 0, 0).toSeq)
  }

  test("resize: empty blob takes the error path") {
    val df = Seq((1L, Array.emptyByteArray), (2L, blob(7, 7))).toDF("doc_id", "blob")
    val out = Multimodal.resize(df, "blob", Seq("doc_id"), 1, 1).collect()
    assert(out.filter(_.getAs[Boolean]("ok")).map(_.getAs[Long]("doc_id")).toSeq === Seq(2L))
    assert(out.filterNot(_.getAs[Boolean]("ok")).map(_.getAs[Long]("doc_id")).toSeq === Seq(1L))
  }

  test("resize mean binning agrees with dHash's binning on the same bytes") {
    // 72 cells (9x8) with w*h = dHash's grid: the factored sampler must
    // reproduce the hash's cell populations — same blob, same cells
    val bytes = Array.tabulate(1000)(i => ((i * 37) % 251).toByte)
    val thumb = Multimodal.thumbnailBytes(bytes, 9, 8)
    assert(thumb.length === 72)
    // spot-check cell 0 against the definition
    val cell0 = bytes.zipWithIndex.filter { case (_, p) => (p.toLong * 72L) / 1000L == 0L }
    val expect = cell0.map(_._1 & 0xff).map(_.toLong).sum / cell0.length
    assert((thumb(0) & 0xff) === expect.toInt)
  }
}
