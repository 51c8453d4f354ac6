package graft.llm

import graft.SparkSpec
import graft.storage.TxTable
import org.apache.spark.sql.functions._

/** [[CorpusProfile]] — incremental sketch state must equal the
  * single-pass batch sketch over the union of increments EXACTLY,
  * through appends, re-appends (HLL only), and compaction.
  */
class CorpusProfileSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def freshState(tag: String): TxTable =
    new TxTable(graft.SparkSpec.spark,
      java.nio.file.Files.createTempDirectory(s"profile_$tag").toString,
      partitionCol = "g")

  private val inc1 = (0 until 3000).map(i => (s"s${i % 3}", s"v_$i"))
  private val inc2 = (2000 until 6000).map(i => (s"s${i % 3}", s"v_$i"))
  private def df(rows: Seq[(String, String)]) = rows.toDF("src", "val")
  private val union = df(inc1 ++ inc2)

  test("HLL view ≡ batch estimate on the union; idempotent under re-append; compact-stable") {
    val st = freshState("hll")
    CorpusProfile.appendHll(st, df(inc1), col("src"), col("val"))
    CorpusProfile.appendHll(st, df(inc2), col("src"), col("val"))
    def est(d: org.apache.spark.sql.DataFrame) =
      d.select("g", "est", "v_zero").as[(String, Double, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    val batch = est(Sketches.hllEstimate(union, col("src"), col("val")))
    assert(est(CorpusProfile.hllView(st)) == batch, "incremental ≡ batch")

    // crash-redelivery: re-appending an increment's registers is a no-op
    CorpusProfile.appendHll(st, df(inc2), col("src"), col("val"))
    assert(est(CorpusProfile.hllView(st)) == batch, "max-merge is idempotent")

    val compacted = CorpusProfile.compactHll(st)
    assert(compacted.nonEmpty)
    assert(est(CorpusProfile.hllView(st)) == batch, "compaction preserves the view")
    // compaction collapsed each group's log to one merged row set
    assert(st.read().count() ==
      Sketches.hllRegisters(df(inc1 ++ inc2), col("src"), col("val")).count())
  }

  test("CM view ≡ batch sketch on the union; lookup works off the view; compact-stable") {
    val st = freshState("cm")
    CorpusProfile.appendCm(st, df(inc1), col("src"), col("val"))
    CorpusProfile.appendCm(st, df(inc2), col("src"), col("val"))
    def cells(d: org.apache.spark.sql.DataFrame) =
      d.select("g", "r", "b", "c").as[(String, Long, String, Long)].collect().toSet
    val batch = cells(Sketches.countMin(union, col("src"), col("val")))
    assert(cells(CorpusProfile.cmView(st)) == batch, "incremental ≡ batch")

    // point estimates off the merged view upper-bound the exact counts
    val keys = Seq(("s1", "v_2500")).toDF("src", "k") // 2500 % 3 = 1; in BOTH increments
    val got = Sketches.countMinLookup(CorpusProfile.cmView(st), keys,
        col("src"), col("k"))
      .select("est").as[Long].head()
    assert(got >= 2L, s"v_2500 occurs twice across increments, est=$got")

    CorpusProfile.compactCm(st)
    assert(cells(CorpusProfile.cmView(st)) == batch, "compaction preserves the view")
  }
}
