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

  test("decoder seam: a PGM blob hashes/resizes exactly like its bare pixel plane") {
    // the invariant the MediaDecoder unification promises: swapping
    // the decoder changes ONLY the sampling stage — dHash/thumbnail
    // over a real decoded pixel plane equal the raw-sampler result
    // over the same plane handed in directly
    val pixels = (0 until 32).map(i => ((i * 37 + 11) % 256).toByte).toArray
    val pgm = ("P5\n# a comment\n8 4\n255\n").getBytes("US-ASCII") ++ pixels
    val dec = new Multimodal.ImageHeaderDecoder

    assert(dec.decode(pgm).width === 8)
    assert(dec.decode(pgm).height === 4)
    assert(Multimodal.dHash(pgm, dec) === Multimodal.dHash(pixels))
    assert(Multimodal.thumbnailBytes(pgm, 3, 2, dec).toSeq ===
      Multimodal.thumbnailBytes(pixels, 3, 2).toSeq)

    // compressed formats have no pixel plane without a codec: the
    // samples path throws (→ ok=false rows), decode still works
    val png = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      Array.fill(20)(0.toByte)
    intercept[IllegalArgumentException] { dec.samples(png) }

    // DataFrame-level: perceptualHash with the real decoder isolates
    // the codec-less PNG as an error row, hashes the PGM
    val df = Seq((1L, pgm), (2L, png)).toDF("doc_id", "blob")
    val out = Multimodal.perceptualHash(df, "blob", Seq("doc_id"), dec).collect()
    assert(out.filter(_.getAs[Boolean]("ok")).map(_.getAs[Long]("doc_id")).toSeq === Seq(1L))
    val (hi, lo) = Multimodal.dHash(pixels)
    val okRow = out.find(_.getAs[Long]("doc_id") == 1L).get
    assert((okRow.getAs[Long]("ph_hi"), okRow.getAs[Long]("ph_lo")) === ((hi, lo)))
  }

  test("demuxer seam: a custom FrameDemuxer changes only the demux stage") {
    // length-prefixed container: [len][len bytes]... — a stand-in for
    // a real variable-frame demuxer; downstream rows are identical in
    // shape to the fixed-size path
    object LenPrefixed extends Multimodal.FrameDemuxer {
      override def frames(bytes: Array[Byte]): Iterator[(Int, Array[Byte])] = {
        if (bytes == null) throw new IllegalArgumentException("missing blob")
        new Iterator[(Int, Array[Byte])] {
          private var p = 0; private var idx = 0
          def hasNext: Boolean = p < bytes.length && p + (bytes(p) & 0xff) < bytes.length
          def next(): (Int, Array[Byte]) = {
            val len = bytes(p) & 0xff
            val f = java.util.Arrays.copyOfRange(bytes, p + 1, p + 1 + len)
            p += 1 + len; val i = idx; idx += 1
            (i, f)
          }
        }
      }
    }
    val df = Seq((7L, blob(2, 10, 11, 3, 20, 21, 22, 1, 30))).toDF("doc_id", "blob")
    val out = Multimodal.frameSample(df, "blob", Seq("doc_id"), LenPrefixed, 1)
      .orderBy("frame_idx").collect()
    assert(out.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 1, 2))
    assert(out(0).getAs[Array[Byte]]("frame").toSeq === blob(10, 11).toSeq)
    assert(out(1).getAs[Array[Byte]]("frame").toSeq === blob(20, 21, 22).toSeq)
    assert(out(2).getAs[Array[Byte]]("frame").toSeq === blob(30).toSeq)
  }

  test("frameSample: a demuxer failing MID-STREAM ends the blob with one error row") {
    // real container demuxers detect truncation inside hasNext/next,
    // not at construction — the error contract must hold there too:
    // frames already emitted stay, then ONE (-1, ok=false) row, and
    // the task (other blobs) survives
    object Truncating extends Multimodal.FrameDemuxer {
      override def frames(bytes: Array[Byte]): Iterator[(Int, Array[Byte])] =
        new Iterator[(Int, Array[Byte])] {
          private var i = 0
          def hasNext: Boolean =
            if (i < bytes.length) true
            // a "short" container is detected as truncated only AFTER
            // its frames were already handed out
            else if (bytes.length < 3) throw new IllegalStateException("truncated container")
            else false
          def next(): (Int, Array[Byte]) = {
            val f = Array(bytes(i)); i += 1; (i - 1, f)
          }
        }
    }
    val df = Seq((1L, blob(9, 8)), (2L, blob(5, 6, 7))).toDF("doc_id", "blob")
    val out = Multimodal.frameSample(df, "blob", Seq("doc_id"), Truncating, 1)
      .orderBy("doc_id", "frame_idx").collect()
    val d1 = out.filter(_.getAs[Long]("doc_id") == 1L)
    assert(d1.map(r => (r.getAs[Int]("frame_idx"), r.getAs[Boolean]("ok"))).toSeq
      === Seq((-1, false), (0, true), (1, true)),
      "emitted frames must survive, truncation adds exactly one error row")
    assert(d1.filterNot(_.getAs[Boolean]("ok")).head.getAs[String]("error")
      .contains("truncated"))
    val d2 = out.filter(_.getAs[Long]("doc_id") == 2L)
    assert(d2.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 1, 2))
    assert(d2.forall(_.getAs[Boolean]("ok")), "healthy blob in the same task unaffected")
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

  test("decoder seam: a deflate-compressed gray-8 PNG decodes to exactly its pixel plane") {
    // a REAL compressed format through the seam: build a PNG whose
    // rows exercise every filter type (None/Sub/Up/Average/Paeth),
    // deflate it with the JDK Deflater, wrap it in proper chunks, and
    // require blob ≡ bare plane through samples/dHash/thumbnail —
    // the PGM invariant, now on compressed input
    val w = 8; val h = 5
    val plane = (0 until w * h).map(i => ((i * 53 + 7) % 256).toByte).toArray
    def u8(b: Byte): Int = b & 0xff
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    // filter each row r with type r % 5, from the ORIGINAL plane
    val raw = new java.io.ByteArrayOutputStream()
    for (r <- 0 until h) {
      val f = r % 5
      raw.write(f)
      for (c <- 0 until w) {
        val x = u8(plane(r * w + c))
        val left = if (c > 0) u8(plane(r * w + c - 1)) else 0
        val up = if (r > 0) u8(plane((r - 1) * w + c)) else 0
        val ul = if (r > 0 && c > 0) u8(plane((r - 1) * w + c - 1)) else 0
        val enc = f match {
          case 0 => x
          case 1 => x - left
          case 2 => x - up
          case 3 => x - ((left + up) >> 1)
          case 4 => x - paeth(left, up, ul)
        }
        raw.write(enc & 0xff)
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw.toByteArray); defl.finish()
    val z = new java.io.ByteArrayOutputStream()
    val zbuf = new Array[Byte](256)
    while (!defl.finished()) z.write(zbuf, 0, defl.deflate(zbuf))
    defl.end()
    def be32(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      be32(data.length) ++ typ.getBytes("US-ASCII") ++ data ++ be32(crc.getValue.toInt)
    }
    val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, 0, 0, 0, 0) // gray-8
    // split the IDAT stream across two chunks: decoders must
    // concatenate payloads before inflating
    val zb = z.toByteArray
    val png = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", ihdr) ++
      chunk("IDAT", zb.take(zb.length / 2)) ++
      chunk("IDAT", zb.drop(zb.length / 2)) ++
      chunk("IEND", Array.empty[Byte])

    val dec = new Multimodal.ImageHeaderDecoder
    assert(dec.decode(png).width === w)
    assert(dec.decode(png).height === h)
    assert(dec.samples(png).toSeq === plane.toSeq,
      "inflate + filter reconstruction must reproduce the exact plane")
    assert(Multimodal.dHash(png, dec) === Multimodal.dHash(plane))
    assert(Multimodal.thumbnailBytes(png, 3, 2, dec).toSeq ===
      Multimodal.thumbnailBytes(plane, 3, 2).toSeq)

    // unsupported layouts still isolate as errors: truecolor (type 2)
    val rgbIhdr = be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)
    val rgbPng = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", rgbIhdr) ++ chunk("IEND", Array.empty[Byte])
    val e = intercept[IllegalArgumentException] { dec.samples(rgbPng) }
    assert(e.getMessage.contains("color type 2"))
    // corrupt deflate stream fails loudly, not with garbage pixels
    val badIdat = zb.clone(); badIdat(badIdat.length - 3) = (badIdat(badIdat.length - 3) ^ 0x5f).toByte
    val badPng = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", badIdat) ++ chunk("IEND", Array.empty[Byte])
    intercept[IllegalArgumentException] { dec.samples(badPng) }
  }

  test("hostile IHDR dimensions are rejected before allocation (no OOM escape)") {
    def be32(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      be32(data.length) ++ typ.getBytes("US-ASCII") ++ data ++ be32(crc.getValue.toInt)
    }
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    // tiny real deflate payload, but an IHDR claiming 40000x40000
    // (1.6 GB raster) — an OutOfMemoryError is an Error, not an
    // Exception, and would escape the callers' ok=false isolation;
    // the decoder must reject the header against the actual
    // compressed size instead of trusting it
    val defl = new java.util.zip.Deflater()
    defl.setInput(Array.fill[Byte](64)(0)); defl.finish()
    val z = new java.io.ByteArrayOutputStream()
    val zbuf = new Array[Byte](256)
    while (!defl.finished()) z.write(zbuf, 0, defl.deflate(zbuf))
    defl.end()
    val hostileIhdr = be32(40000) ++ be32(40000) ++ Array[Byte](8, 0, 0, 0, 0)
    val hostile = sig ++ chunk("IHDR", hostileIhdr) ++
      chunk("IDAT", z.toByteArray) ++ chunk("IEND", Array.empty[Byte])
    val dec = new Multimodal.ImageHeaderDecoder
    val e = intercept[IllegalArgumentException] { dec.samples(hostile) }
    assert(e.getMessage.contains("implausible"))
    // near-2^31 dims: h*(w+1) Int overflow must also land in the
    // same guarded rejection, not a NegativeArraySizeException
    val hugeIhdr = be32(Int.MaxValue - 1) ++ be32(Int.MaxValue - 1) ++ Array[Byte](8, 0, 0, 0, 0)
    val huge = sig ++ chunk("IHDR", hugeIhdr) ++
      chunk("IDAT", z.toByteArray) ++ chunk("IEND", Array.empty[Byte])
    val e2 = intercept[IllegalArgumentException] { dec.samples(huge) }
    assert(e2.getMessage.contains("implausible"))
  }
}
