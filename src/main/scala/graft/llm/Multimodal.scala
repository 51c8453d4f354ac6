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

  /** The unified codec seam of the content ops ([[dHash]],
    * [[audioFingerprint]], [[thumbnailBytes]]): a decoder turns a blob
    * into a 1-D stream of 0..255 samples — a row-major grayscale
    * raster for images, PCM-ish amplitudes for audio — and everything
    * downstream (cell/frame binning, bit layout, Hamming pairing,
    * letterboxing) is sample-source-independent. The default
    * [[RawByteSampler]] reads the payload bytes AS the samples — the
    * documented stub for this codec-less environment, integer-exact
    * and SQL-reproducible for the oracle. A real deployment swaps in
    * one decoder class (e.g. [[ImageHeaderDecoder]]'s PGM path, or a
    * JNI codec) and every multimodal op picks it up through this one
    * seam. Throws on undecodable input — callers' per-row error
    * isolation turns that into ok=false.
    */
  trait SampleDecoder extends Serializable {
    def samples(bytes: Array[Byte]): Array[Byte]
  }

  /** Raw payload bytes as the sample stream (the stub decode slot —
    * null/empty rejected like every decoder).
    */
  object RawByteSampler extends SampleDecoder {
    override def samples(bytes: Array[Byte]): Array[Byte] = {
      if (bytes == null || bytes.isEmpty)
        throw new IllegalArgumentException("missing or empty blob")
      bytes
    }
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

  /** A real (if minimal) codec: parses PNG and JPEG headers for
    * dimensions, and binary PGM (P5) all the way to its pixel plane —
    * no image library, just the public file formats (PNG: RFC 2083
    * §3.1 signature + IHDR chunk; JPEG: ISO/IEC 10918-1 marker
    * segments walked to the first SOFn frame header; PGM: the
    * netpbm P5 header + raw 8-bit gray raster). Anything else —
    * truncated headers, wrong magic, a JPEG with no frame before
    * start-of-scan — throws, exercising [[extractFeatures]]'s
    * error-isolation path with genuinely malformed media rather than
    * a stubbed failure.
    *
    * As a [[SampleDecoder]] it serves real luminance planes into
    * [[dHash]]/[[thumbnailBytes]]: PGM's raw raster, and gray-8
    * PNG's raster fully decoded — IDAT inflate (JDK `Inflater`) plus
    * per-row filter reconstruction — so a genuinely COMPRESSED format
    * runs on genuine pixels with zero codec dependencies. JPEG (and
    * non-gray-8 PNG layouts) throw there (entropy-coded DCT needs a
    * real codec library), taking the ok=false path.
    */
  class ImageHeaderDecoder extends MediaDecoder with SampleDecoder {
    private def u8(b: Byte): Int = b & 0xff
    private def be16(a: Array[Byte], i: Int): Int = (u8(a(i)) << 8) | u8(a(i + 1))
    private def be32(a: Array[Byte], i: Int): Int =
      (u8(a(i)) << 24) | (u8(a(i + 1)) << 16) | (u8(a(i + 2)) << 8) | u8(a(i + 3))

    private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    private def parsePng(a: Array[Byte]): (Int, Int) = {
      // signature, 4-byte chunk length, then the IHDR chunk: the spec
      // requires IHDR first, so width/height sit at fixed offsets 16/20
      if (a.length < 24) throw new IllegalArgumentException("truncated PNG header")
      if (!(12 until 16).forall(i => a(i) == "IHDR".charAt(i - 12).toByte))
        throw new IllegalArgumentException("PNG first chunk is not IHDR")
      val w = be32(a, 16); val h = be32(a, 20)
      if (w <= 0 || h <= 0)
        throw new IllegalArgumentException(s"invalid PNG dimensions ${w}x$h")
      (w, h)
    }

    private def parseJpeg(a: Array[Byte]): (Int, Int) = {
      var i = 2 // past SOI
      while (i + 3 < a.length) {
        if (u8(a(i)) != 0xff)
          throw new IllegalArgumentException(f"bad JPEG marker byte 0x${u8(a(i))}%02x at $i")
        var j = i + 1
        while (j < a.length && u8(a(j)) == 0xff) j += 1 // fill bytes
        if (j >= a.length) throw new IllegalArgumentException("truncated JPEG")
        val marker = u8(a(j))
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          // SOFn frame header: [len16][precision8][height16][width16]
          if (j + 8 >= a.length) throw new IllegalArgumentException("truncated JPEG SOF")
          val h = be16(a, j + 4); val w = be16(a, j + 6)
          if (w <= 0 || h <= 0)
            throw new IllegalArgumentException(s"invalid JPEG dimensions ${w}x$h")
          return (w, h)
        }
        if (marker == 0xda)
          throw new IllegalArgumentException("JPEG start-of-scan before any SOF header")
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) i = j + 1 // standalone
        else {
          if (j + 2 >= a.length) throw new IllegalArgumentException("truncated JPEG segment")
          val len = be16(a, j + 1)
          if (len < 2) throw new IllegalArgumentException(s"bad JPEG segment length $len")
          i = j + 1 + len
        }
      }
      throw new IllegalArgumentException("no JPEG SOF header found")
    }

    /** Binary PGM (netpbm P5): ASCII header `P5 <w> <h> <maxval>`
      * (whitespace-separated, `#` comments allowed) followed by one
      * whitespace byte and the w·h raw gray raster. Returns
      * (w, h, offset-of-raster).
      */
    private def parsePgmHeader(a: Array[Byte]): (Int, Int, Int) = {
      var i = 2
      def nextInt(): Int = {
        var done = false
        while (!done && i < a.length) {
          val c = a(i).toChar
          if (c == '#') { while (i < a.length && a(i) != '\n'.toByte) i += 1 }
          else if (c.isWhitespace) i += 1
          else done = true
        }
        if (i >= a.length || !a(i).toChar.isDigit)
          throw new IllegalArgumentException("truncated PGM header")
        var v = 0
        while (i < a.length && a(i).toChar.isDigit) { v = v * 10 + (a(i) - '0'); i += 1 }
        v
      }
      val w = nextInt(); val h = nextInt(); val mx = nextInt()
      if (w <= 0 || h <= 0)
        throw new IllegalArgumentException(s"invalid PGM dimensions ${w}x$h")
      if (mx != 255)
        throw new IllegalArgumentException(s"unsupported PGM maxval $mx (8-bit only)")
      i += 1 // the single whitespace separating header from raster
      if (a.length - i < w * h)
        throw new IllegalArgumentException("truncated PGM pixel data")
      (w, h, i)
    }

    private def isPgm(bytes: Array[Byte]): Boolean =
      bytes.length >= 2 && bytes(0) == 'P'.toByte && bytes(1) == '5'.toByte

    override def decode(bytes: Array[Byte]): MediaFeatures = {
      if (bytes == null || bytes.length < 2)
        throw new IllegalArgumentException("empty or missing blob")
      val (w, h) =
        if (bytes.length >= 8 && PngSig.indices.forall(i => bytes(i) == PngSig(i)))
          parsePng(bytes)
        else if (u8(bytes(0)) == 0xff && u8(bytes(1)) == 0xd8)
          parseJpeg(bytes)
        else if (isPgm(bytes)) { val (w0, h0, _) = parsePgmHeader(bytes); (w0, h0) }
        else throw new IllegalArgumentException("unsupported image format (not PNG/JPEG/PGM)")
      val md = java.security.MessageDigest.getInstance("MD5")
      MediaFeatures(bytes.length.toLong, md.digest(bytes).map("%02x".format(_)).mkString,
        w, h, ok = true, error = "")
    }

    /** Full pixel decode of an 8-bit grayscale non-interlaced PNG
      * (RFC 2083: IHDR walk, concatenated IDAT zlib stream inflated
      * with the JDK `Inflater`, then per-row filter reconstruction —
      * None/Sub/Up/Average/Paeth, §6). Grayscale-only by design: the
      * [[SampleDecoder]] contract is a luminance plane, and gray-8 is
      * the one PNG layout whose raster IS that plane (bpp = 1); color
      * types would smuggle an RGB→luma convention into the seam.
      * Returns the w·h row-major plane.
      */
    private def decodePngGray(a: Array[Byte]): Array[Byte] = {
      if (a.length < 33) // sig + IHDR len/type + 13 data + crc
        throw new IllegalArgumentException("truncated PNG header")
      val (w, h) = parsePng(a) // validates signature + IHDR placement
      val bitDepth = u8(a(24)); val colorType = u8(a(25))
      val interlace = u8(a(28))
      if (bitDepth != 8 || colorType != 0)
        throw new IllegalArgumentException(
          s"unsupported PNG layout (bit depth $bitDepth, color type $colorType; gray-8 only)")
      if (interlace != 0)
        throw new IllegalArgumentException("interlaced PNG not supported")
      // walk chunks, concatenating every IDAT payload (the zlib
      // stream may be split across chunks at arbitrary byte offsets)
      val zs = new java.io.ByteArrayOutputStream()
      var i = 8
      var sawEnd = false
      while (!sawEnd && i + 8 <= a.length) {
        val len = be32(a, i)
        val typ = new String(a, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        if (len < 0 || i + 12 + len > a.length)
          throw new IllegalArgumentException(s"truncated PNG chunk $typ")
        if (typ == "IDAT") zs.write(a, i + 8, len)
        if (typ == "IEND") sawEnd = true
        i += 12 + len
      }
      if (zs.size() == 0) throw new IllegalArgumentException("PNG has no IDAT data")
      // Bound the decode allocation BEFORE trusting IHDR dimensions: a
      // hostile header claiming e.g. 40000x40000 would otherwise force
      // a multi-GB allocation whose OutOfMemoryError (an Error, not an
      // Exception) escapes the per-row ok=false isolation upstream and
      // kills the task. Sizes computed in Long (h*(w+1) overflows Int
      // near 2^31); the deflate stream can expand at most 1032:1
      // (RFC 1951 — one bit per symbol, 258-byte matches), so a raster
      // larger than zs.size()*1032 cannot be backed by real data.
      val rawLen = h.toLong * (w.toLong + 1L)
      val maxInflated = zs.size().toLong * 1032L + 64L
      if (rawLen > maxInflated || rawLen > Int.MaxValue - 8)
        throw new IllegalArgumentException(
          s"implausible PNG dimensions ${w}x$h for ${zs.size()} compressed bytes")
      val raw = new Array[Byte](rawLen.toInt) // one filter byte + w samples per row
      val inf = new java.util.zip.Inflater()
      inf.setInput(zs.toByteArray)
      var got = 0
      try {
        while (got < raw.length && !inf.finished()) {
          val n = inf.inflate(raw, got, raw.length - got)
          if (n == 0 && inf.needsInput())
            throw new IllegalArgumentException("truncated PNG IDAT stream")
          got += n
        }
      } catch { case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"corrupt PNG deflate stream: ${e.getMessage}")
      } finally inf.end()
      if (got < raw.length)
        throw new IllegalArgumentException("truncated PNG pixel data")
      // per-row filter reconstruction, bpp = 1 (left neighbor is the
      // previous byte in the row, up is the reconstructed row above)
      val out = new Array[Byte](w * h)
      var r = 0
      while (r < h) {
        val f = u8(raw(r * (w + 1)))
        var c = 0
        while (c < w) {
          val x = u8(raw(r * (w + 1) + 1 + c))
          val left = if (c > 0) u8(out(r * w + c - 1)) else 0
          val up = if (r > 0) u8(out((r - 1) * w + c)) else 0
          val ul = if (r > 0 && c > 0) u8(out((r - 1) * w + c - 1)) else 0
          val rec = f match {
            case 0 => x
            case 1 => x + left
            case 2 => x + up
            case 3 => x + ((left + up) >> 1)
            case 4 =>
              val p = left + up - ul
              val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
              x + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
            case other =>
              throw new IllegalArgumentException(s"bad PNG filter type $other in row $r")
          }
          out(r * w + c) = (rec & 0xff).toByte
          c += 1
        }
        r += 1
      }
      out
    }

    /** Decoded luminance plane (row-major): PGM's raw raster, or a
      * gray-8 PNG's inflated+unfiltered raster ([[decodePngGray]] —
      * a genuinely compressed format decoded to real pixels with zero
      * codec dependencies). JPEG (and non-gray-8 PNG layouts) still
      * throw into the callers' ok=false path: entropy-coded DCT needs
      * a real codec library.
      */
    override def samples(bytes: Array[Byte]): Array[Byte] = {
      if (bytes == null || bytes.length < 2)
        throw new IllegalArgumentException("empty or missing blob")
      if (bytes.length >= 8 && PngSig.indices.forall(i => bytes(i) == PngSig(i)))
        return decodePngGray(bytes)
      if (!isPgm(bytes))
        throw new IllegalArgumentException(
          "no pixel plane without a codec (PGM and gray-8 PNG are the decodable paths)")
      val (w, h, off) = parsePgmHeader(bytes)
      java.util.Arrays.copyOfRange(bytes, off, off + w * h)
    }
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("digest", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("ok", BooleanType, nullable = false),
    StructField("error", StringType, nullable = false)))

  /** Perceptual dHash of a blob (the public "difference hash" of the
    * aHash/dHash/pHash family — Krawetz's widely-documented variant):
    * a 9×8 grayscale thumbnail, one bit per adjacent-cell comparison
    * (bit r·8+c set when cell (r,c) is brighter than cell (r,c+1)),
    * robust to re-encodes because only the coarse brightness GRADIENT
    * survives into the hash. The decode+resize step is the
    * [[SampleDecoder]] seam: the thumbnail derives from the decoder's
    * sample stream — cell i sums the samples p with (p·72)/n = i —
    * so under the default [[RawByteSampler]] a small byte
    * perturbation moves only its own cells (near-dup-preserving) and
    * the whole computation is integer-exact and SQL-reproducible for
    * the oracle, while a real decoder (e.g. [[ImageHeaderDecoder]]'s
    * PGM pixel plane) swaps in decoded luminance through the same
    * argument; everything downstream (bit layout, Hamming pairing via
    * [[Dedup.simHashPairs]]) is decoder-independent — spec'd by
    * hashing a PGM blob and its bare pixel plane to the same bits.
    *
    * Brightness comparison is cross-multiplied (sumₗ·cntᵣ > sumᵣ·cntₗ)
    * — no float division anywhere; exact for blobs < 2²⁷ bytes
    * (255·n² must stay inside a signed 64-bit), larger blobs take the
    * error path. The 64 bits return as two 32-bit halves so neither
    * engine ever manufactures a sign bit.
    */
  private[llm] def dHash(bytes: Array[Byte],
                         dec: SampleDecoder = RawByteSampler): (Long, Long) = {
    // empty takes the error path like null (every decoder rejects it):
    // the all-zero hash an empty blob would produce pairs with every
    // other empty at Hamming 0 — a candidate-pair flood on dirty
    // corpora (the oracle SQL mirrors the exclusion)
    val s = dec.samples(bytes)
    val n = s.length
    if (n >= (1 << 27)) throw new IllegalArgumentException(s"blob too large for exact dHash: $n samples")
    if (n == 0) throw new IllegalArgumentException("decoder produced no samples")
    val sums = new Array[Long](72); val cnts = new Array[Long](72)
    var p = 0
    while (p < n) {
      val cell = ((p.toLong * 72L) / n).toInt
      sums(cell) += (s(p) & 0xff); cnts(cell) += 1
      p += 1
    }
    var hi = 0L; var lo = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        val l = r * 9 + c; val rt = l + 1
        val k = r * 8 + c
        if (sums(l) * cnts(rt) > sums(rt) * cnts(l)) {
          if (k >= 32) hi |= 1L << (k - 32) else lo |= 1L << k
        }
        c += 1
      }
      r += 1
    }
    (hi, lo)
  }

  /** Audio fingerprint over the stubbed decode slot — the 1-D analog
    * of [[dHash]] (the energy-delta family behind public audio
    * fingerprinting à la Haitsma/Kalker's robust hash: fingerprint
    * bits are SIGNS of energy differences between adjacent frames,
    * which survive re-encoding because absolute levels cancel).
    * The decode step is the same [[SampleDecoder]] seam as [[dHash]]:
    * samples (payload bytes under the default [[RawByteSampler]],
    * decoded PCM under a real codec) are framed into 65 windows by
    * the same (p·frames)/n partition; frame energy is the exact
    * integer Σv² and bit k compares energy(k) > energy(k+1) — 64
    * bits, two sign-safe halves, [[Dedup.simHashPairs]]-ready;
    * everything downstream is decoder-independent. Exact for blobs
    * < 2²⁶ samples (255²·n stays inside int64 per frame; the guard
    * mirrors dHash's).
    */
  private[llm] def audioFingerprint(bytes: Array[Byte],
                                    dec: SampleDecoder = RawByteSampler): (Long, Long) = {
    // empty → error path, same rationale as dHash's guard
    val s = dec.samples(bytes)
    val n = s.length
    if (n >= (1 << 26)) throw new IllegalArgumentException(s"blob too large for exact fingerprint: $n samples")
    if (n == 0) throw new IllegalArgumentException("decoder produced no samples")
    val frames = 65
    val energy = new Array[Long](frames)
    var p = 0
    while (p < n) {
      val f = ((p.toLong * frames.toLong) / n).toInt
      val v = (s(p) & 0xff).toLong
      energy(f) += v * v
      p += 1
    }
    var hi = 0L; var lo = 0L
    var k = 0
    while (k < 64) {
      if (energy(k) > energy(k + 1)) {
        if (k >= 32) hi |= 1L << (k - 32) else lo |= 1L << k
      }
      k += 1
    }
    (hi, lo)
  }

  /** [[audioFingerprint]] over a binary column, batched per partition;
    * returns idCols + (fp_hi, fp_lo, ok, error) — feed
    * `(fp_hi << 32) | fp_lo` to [[Dedup.simHashPairs]] like the image
    * path.
    */
  def audioHash(df: DataFrame, binCol: String, idCols: Seq[String],
                dec: SampleDecoder = RawByteSampler): DataFrame = {
    val in = df.select((idCols :+ binCol).map(col): _*)
    val outSchema = StructType(idCols.map(in.schema(_)) ++ Seq(
      StructField("fp_hi", LongType, nullable = false),
      StructField("fp_lo", LongType, nullable = false),
      StructField("ok", BooleanType, nullable = false),
      StructField("error", StringType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binCol)
        try {
          val (hi, lo) = audioFingerprint(bytes, dec)
          Row.fromSeq(idCols.map(r.getAs[Any]) ++ Seq(hi, lo, true, ""))
        } catch { case e: Exception =>
          Row.fromSeq(idCols.map(r.getAs[Any]) ++
            Seq(0L, 0L, false, String.valueOf(e.getMessage)))
        }
      }
    }(enc)
  }

  /** [[dHash]] over a binary column, batched per partition like
    * [[extractFeatures]]: returns idCols + (ph_hi, ph_lo, ok, error).
    * Feed `(ph_hi << 32) | ph_lo` to [[Dedup.simHashPairs]] for
    * Hamming-radius near-duplicate pairs — image dedup reuses the
    * SimHash pigeonhole machinery unchanged.
    */
  def perceptualHash(df: DataFrame, binCol: String, idCols: Seq[String],
                     dec: SampleDecoder = RawByteSampler): DataFrame = {
    val in = df.select((idCols :+ binCol).map(col): _*)
    val outSchema = StructType(idCols.map(in.schema(_)) ++ Seq(
      StructField("ph_hi", LongType, nullable = false),
      StructField("ph_lo", LongType, nullable = false),
      StructField("ok", BooleanType, nullable = false),
      StructField("error", StringType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binCol)
        try {
          val (hi, lo) = dHash(bytes, dec)
          Row.fromSeq(idCols.map(r.getAs[Any]) ++ Seq(hi, lo, true, ""))
        } catch { case e: Exception =>
          Row.fromSeq(idCols.map(r.getAs[Any]) ++
            Seq(0L, 0L, false, String.valueOf(e.getMessage)))
        }
      }
    }(enc)
  }

  /** Deterministic thumbnail "resize" over the [[SampleDecoder]]
    * seam: cell i of the w×h grayscale grid is the integer mean of
    * the samples p with (p·w·h)/n == i — the SAME 1-D binning
    * [[dHash]] uses, factored to a standalone op because resize is
    * its own pipeline stage (dedup wants hashes, training wants
    * thumbnails). Under the default [[RawByteSampler]] the samples
    * are the payload bytes (integer-exact, so the oracle rebuilds
    * the blob hex-digit-for-hex-digit in SQL); a real decoder swaps
    * in pixel luminance. The output contract — a w·h-byte blob, one
    * byte per cell, row-major — is decoder-independent. Cells an
    * undersized blob never reaches stay 0 (letterboxing).
    */
  private[llm] def thumbnailBytes(bytes: Array[Byte], w: Int, h: Int,
                                  dec: SampleDecoder = RawByteSampler): Array[Byte] = {
    val s = dec.samples(bytes)
    val cells = w * h
    val n = s.length
    val sums = new Array[Long](cells); val cnts = new Array[Long](cells)
    var p = 0
    while (p < n) {
      val cell = ((p.toLong * cells.toLong) / n).toInt
      sums(cell) += (s(p) & 0xff); cnts(cell) += 1
      p += 1
    }
    val out = new Array[Byte](cells)
    var i = 0
    while (i < cells) {
      out(i) = (if (cnts(i) == 0) 0 else (sums(i) / cnts(i)).toInt).toByte
      i += 1
    }
    out
  }

  /** [[thumbnailBytes]] over a binary column, batched per partition
    * like [[extractFeatures]]: returns idCols + (thumb, ok, error).
    */
  def resize(df: DataFrame, binCol: String, idCols: Seq[String],
             w: Int, h: Int, dec: SampleDecoder = RawByteSampler): DataFrame = {
    require(w > 0 && h > 0, s"resize: non-positive dimensions ${w}x$h")
    val in = df.select((idCols :+ binCol).map(col): _*)
    val outSchema = StructType(idCols.map(in.schema(_)) ++ Seq(
      StructField("thumb", BinaryType, nullable = true),
      StructField("ok", BooleanType, nullable = false),
      StructField("error", StringType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binCol)
        try Row.fromSeq(idCols.map(r.getAs[Any]) ++
          Seq(thumbnailBytes(bytes, w, h, dec), true, ""))
        catch { case e: Exception =>
          Row.fromSeq(idCols.map(r.getAs[Any]) ++
            Seq(null, false, String.valueOf(e.getMessage)))
        }
      }
    }(enc)
  }

  /** The video-container seam, parallel to [[SampleDecoder]]: a
    * demuxer turns a blob into a LAZY iterator of (frame_idx, frame
    * bytes) — lazy so a long video never materializes all frames in
    * executor memory at once. [[FixedSizeDemuxer]] is the stub (a
    * fixed-byte-frame container); a real deployment implements this
    * with an mp4/webm demuxer and every frame-level op picks it up.
    */
  trait FrameDemuxer extends Serializable {
    def frames(bytes: Array[Byte]): Iterator[(Int, Array[Byte])]
  }

  /** Stub demuxer: `frameBytes` per frame, trailing partial frame
    * dropped; null rejected like every decoder.
    */
  final class FixedSizeDemuxer(frameBytes: Int) extends FrameDemuxer {
    require(frameBytes > 0, s"non-positive frameBytes $frameBytes")
    override def frames(bytes: Array[Byte]): Iterator[(Int, Array[Byte])] = {
      if (bytes == null) throw new IllegalArgumentException("missing blob")
      val nf = bytes.length / frameBytes
      Iterator.range(0, nf).map { i =>
        (i, java.util.Arrays.copyOfRange(bytes, i * frameBytes, (i + 1) * frameBytes))
      }
    }
  }

  /** Frame demux + sampling — the video slot of the pipeline: the
    * demuxer's frames are emitted as their own rows (frame_idx,
    * frame), keeping every `every`-th by the demuxer's frame index.
    * Emission happens inside `mapPartitions` off the demuxer's lazy
    * iterator; downstream per-frame ops ([[resize]],
    * [[perceptualHash]] for frame-level dedup) compose on the
    * exploded rows. A decode error — at demux construction OR
    * mid-stream (a real container demuxer detects truncation inside
    * hasNext/next) — ends that blob with ONE (frame_idx = −1,
    * ok=false) row after any frames already emitted, so the failing
    * blob stays visible to the error sink without killing the job.
    */
  def frameSample(df: DataFrame, binCol: String, idCols: Seq[String],
                  frameBytes: Int, every: Int): DataFrame =
    frameSample(df, binCol, idCols, new FixedSizeDemuxer(frameBytes), every)

  /** [[frameSample]] over an arbitrary [[FrameDemuxer]]. */
  def frameSample(df: DataFrame, binCol: String, idCols: Seq[String],
                  demux: FrameDemuxer, every: Int): DataFrame = {
    require(every > 0, s"frameSample: non-positive sampling step $every")
    val in = df.select((idCols :+ binCol).map(col): _*)
    val outSchema = StructType(idCols.map(in.schema(_)) ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = true),
      StructField("ok", BooleanType, nullable = false),
      StructField("error", StringType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    in.mapPartitions { rows =>
      rows.flatMap { r =>
        val ids = idCols.map(r.getAs[Any])
        def errRow(e: Exception) =
          Row.fromSeq(ids ++ Seq(-1, null, false, String.valueOf(e.getMessage)))
        // the demuxer is lazy, so failures surface in hasNext/next as
        // well as at construction; the wrapper converts ANY of them
        // into the single error row instead of killing the task
        new scala.collection.AbstractIterator[Row] {
          private var pendingError: Row = null
          private var finished = false
          private val under: Iterator[(Int, Array[Byte])] =
            try demux.frames(r.getAs[Array[Byte]](binCol)).filter(_._1 % every == 0)
            catch { case e: Exception => pendingError = errRow(e); Iterator.empty }
          override def hasNext: Boolean =
            !finished && (pendingError != null ||
              (try under.hasNext
               catch { case e: Exception => pendingError = errRow(e); true }))
          override def next(): Row = {
            if (pendingError != null) {
              finished = true
              val out = pendingError; pendingError = null; out
            } else {
              try { val (i, f) = under.next(); Row.fromSeq(ids ++ Seq(i, f, true, "")) }
              catch { case e: Exception => finished = true; errRow(e) }
            }
          }
        }
      }
    }(enc)
  }

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
