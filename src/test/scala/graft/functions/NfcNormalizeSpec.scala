package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NfcNormalizeSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def nfcOf(s: String): String =
    Seq(s).toDF("t").select(NfcNormalize.nfc(col("t"))).head().getString(0)

  test("composes decomposed sequences canonically") {
    assert(nfcOf("Å") === "Å")          // A + ring -> Å
    assert(nfcOf("café") === "café")    // e + acute -> é
    assert(nfcOf("Á é") === "Á é")
  }

  test("already-normalized and ASCII inputs are returned unchanged") {
    assert(nfcOf("plain ascii 123") === "plain ascii 123")
    assert(nfcOf("café") === "café")     // precomposed is a fixpoint
    assert(nfcOf("") === "")
  }

  test("idempotent and null-propagating") {
    val once = nfcOf("x Å y é")
    assert(nfcOf(once) === once)
    val n = Seq[Option[String]](None).toDF("t")
      .select(NfcNormalize.nfc(col("t"))).head()
    assert(n.isNullAt(0))
  }

  test("registered in SQL via GraftExtensions") {
    graft.GraftExtensions.register(spark)
    val got = spark.sql("SELECT nfc_normalize('Å') AS v").head().getString(0)
    assert(got === "Å")
  }

  test("length contracts across composition like the oracle's codepoint length") {
    val df = Seq("Å café").toDF("t")
      .select(length(col("t")).as("raw"),
        length(NfcNormalize.nfc(col("t"))).as("nfc"))
    val r = df.head()
    // raw: A,ring,space,c,a,f,e,acute = 8 codepoints; NFC folds the
    // two combining marks into their bases -> 6
    assert(r.getInt(0) === 8 && r.getInt(1) === 6)
  }
}
