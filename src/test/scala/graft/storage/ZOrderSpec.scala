package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[ZOrder]] — Morton-curve layout: interleave correctness, bound
  * clamping, and the measured skipping claim: per-file min/max stats
  * tight on BOTH dimensions, vs a single-column sort whose files span
  * the full co-dimension.
  */
class ZOrderSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  test("zValue interleaves bits; rangeBucket bins and clamps") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L)).toDF("x", "y")
    val got = df.select(ZOrder.zValue(Seq(col("x"), col("y")), 3).as("z"))
      .as[Long].collect().toSeq
    // x bits land at even positions, y at odd: (3,5) = x:011, y:101
    // → z = y2 x2 y1 x1 y0 x0 = 1 0 0 1 1 1 = 100111b = 39
    assert(got === Seq(0L, 1L, 2L, 39L))

    val b = Seq(-50L, 0L, 512L, 1023L, 5000L).toDF("v")
      .select(ZOrder.rangeBucket(col("v"), 0L, 1023L, 4).as("b"))
      .as[Long].collect().toSeq
    assert(b === Seq(0L, 0L, 8L, 15L, 15L), "linear bins, out-of-bounds clamped")
  }

  test("z-ordered files have tight 2-D stats; a y-slice prunes where x-sort cannot") {
    val n = 100000
    // deterministic uniform-ish 2-D points (Knuth multiplicative hash
    // for y so x and y are independent)
    val pts = spark.range(n).select(
      (col("id") % 1024L).as("x"),
      ((col("id") * 2654435761L) % 1024L).as("y"))
    val zDir = java.nio.file.Files.createTempDirectory("zord").toString
    val xDir = java.nio.file.Files.createTempDirectory("xsort").toString
    ZOrder.writeZOrdered(pts, zDir,
      Seq((col("x"), 0L, 1023L), (col("y"), 0L, 1023L)), bitsPer = 10, files = 16)
    pts.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(xDir)

    // per-file min/max stats — the exact information a stats-aware
    // scan (parquet row-group pruning, a Delta/Iceberg-style file
    // index, TxTable + footer stats) prunes with
    def fileStats(dir: String): Seq[(Long, Long, Long, Long)] =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
        .toSeq.map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(min("x"), max("x"), min("y"), max("y")).head()
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        }
    def touching(stats: Seq[(Long, Long, Long, Long)],
                 xr: (Long, Long), yr: (Long, Long)): Int =
      stats.count { case (x0, x1, y0, y1) =>
        x1 >= xr._1 && x0 <= xr._2 && y1 >= yr._1 && y0 <= yr._2
      }
    val zs = fileStats(zDir); val xs = fileStats(xDir)
    assert(zs.size == 16 && xs.size == 16)

    // y-only slice (x unconstrained): the single-column sort reads
    // EVERYTHING; the Morton layout confines y to a prefix sub-grid
    val zTouch = touching(zs, (0L, 1023L), (0L, 255L))
    val xTouch = touching(xs, (0L, 1023L), (0L, 255L))
    assert(xTouch == 16, "x-sorted files all span the full y range")
    assert(zTouch <= 8, s"z-order must confine a 1/4 y-slice: touched $zTouch/16")

    // a 2-D box touches a small corner of the grid
    val boxTouch = touching(zs, (0L, 255L), (0L, 255L))
    assert(boxTouch <= 4, s"1/4 x 1/4 box should touch <= 4/16 files: $boxTouch")

    // layout changes bytes-on-disk order only — the box answer is
    // identical from both layouts
    def boxCount(dir: String): Long = spark.read.parquet(dir)
      .filter(col("x") < 256L && col("y") < 256L).count()
    assert(boxCount(zDir) == boxCount(xDir))
  }
}
