package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Dedup.editNearDups]] — LSH candidates verified by normalized
  * Levenshtein similarity. Pins: the order-blindness case Jaccard
  * admits and edit similarity rejects, the truncation closed form
  * sim = 1 − k/len, the length prefilter never dropping a pair the
  * exact filter keeps (slack contract), and partition determinism.
  */
class EditNearDupsSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def withShingles(rows: Seq[(Long, String)]) = {
    val df = rows.toDF("id", "text")
    df.withColumn("sh",
      TextOps.wordNgrams(TextOps.words(col("text")), 3))
  }

  // bandsOf = 1 in the spec: any single shared minhash makes the pair
  // a candidate, so high-overlap fixtures collide deterministically
  // and the tests exercise the VERIFIER, not band-geometry luck
  private def run(rows: Seq[(Long, String)], tau: Double, bandsOf: Int = 1) =
    Dedup.editNearDups(withShingles(rows), col("id"), col("text"),
        col("sh"), k = 8, bandsOf = bandsOf, tau = tau)
      .orderBy("id_a", "id_b")
      .collect()

  test("exact copy verifies at sim = 1.0, dist = 0") {
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val out = run(Seq(1L -> t, 2L -> t), tau = 0.9)
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 0L)
    assert(r.getDouble(3) == 1.0d)
  }

  test("suffix truncation gives the closed-form sim = 1 - k/len") {
    val t = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4).trim
    val cut = 20
    val trimmed = t.substring(0, t.length - cut)
    val out = run(Seq(1L -> t, 2L -> trimmed), tau = 0.5)
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(2) == cut.toLong)
    assert(r.getDouble(3) == 1.0d - cut.toDouble / t.length)
  }

  test("reordered text: shingle Jaccard admits, edit similarity rejects") {
    // two documents with near-identical shingle BAGS in a different
    // arrangement: the repeated phrase makes word-3-gram sets collide
    // (LSH candidates fire) while the sequence differs everywhere
    val a = "one two three one two three one two three one two three"
    val b = "three two one three two one three two one three two one"
    val jac = Dedup.minHashNearDups(withShingles(Seq(1L -> a, 2L -> b)),
      col("id"), col("sh"), 8, 2, 0.0d).collect()
    val edit = run(Seq(1L -> a, 2L -> b), tau = 0.8)
    // candidate machinery sees them or not — but if a candidate fires,
    // the edit verifier must reject where the arrangement differs this
    // much (dist >= number of changed positions)
    assert(edit.isEmpty)
    // sanity: the same pair under Jaccard-at-0 (pure candidates) may
    // appear; the point is the verifier disagrees with set overlap
    if (jac.nonEmpty) assert(jac.head.getDouble(2) > 0.5d)
  }

  test("prefilter slack: a pair exactly at tau survives") {
    // suffix cut of exactly len/4 chars: maxlen = len, dist = len/4,
    // sim = 0.75 EXACTLY — the boundary the prefilter must not eat
    val base = (1 to 30).map(i => f"w$i%02d").mkString(" ")
    val t = base + "x" * ((4 - base.length % 4) % 4)
    assert(t.length % 4 == 0)
    val cut = t.length / 4
    val trimmed = t.substring(0, t.length - cut)
    val out = run(Seq(1L -> t, 2L -> trimmed), tau = 0.75)
    assert(out.length == 1)
    assert(out.head.getLong(2) == cut.toLong)
    assert(out.head.getDouble(3) == 0.75d)
  }

  test("below-tau pair is dropped by the exact filter") {
    val t = ("alpha beta gamma delta " * 3).trim // 71 chars
    val trimmed = t.substring(0, t.length - 30)
    val out = run(Seq(1L -> t, 2L -> trimmed), tau = 0.75)
    assert(out.isEmpty) // sim = 1 - 30/71 ≈ 0.577
  }

  test("partition determinism: 1 vs 8 shuffle partitions agree") {
    val rows = (0L until 40L).map { i =>
      val t = s"document $i " + ("shared common phrase body text " * 3).trim
      i -> (if (i % 4 == 0) t.substring(0, t.length - 10) else t)
    }
    val a = run(rows, tau = 0.6).map(_.toString).toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val b = run(rows, tau = 0.6).map(_.toString).toSeq
      assert(a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
