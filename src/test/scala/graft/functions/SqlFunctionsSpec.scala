package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQL registration of the native kernels via [[graft.GraftExtensions]]
  * — the `spark.sql` user gets the same codegen'd expressions the
  * DataFrame API uses, with literal-argument validation at plan time.
  */
class SqlFunctionsSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  test("vec_dot from SQL equals the Column-API kernel") {
    graft.GraftExtensions.register(spark)
    Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val sql = spark.sql("SELECT vec_dot(a, b) AS d FROM vecs").first().getDouble(0)
    assert(sql === 32.0)
    val api = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
      .select(VecExprs.vecDot(col("a"), col("b"))).first().getDouble(0)
    assert(sql === api)
  }

  test("winnow_set from SQL equals the Column-API kernel") {
    graft.GraftExtensions.register(spark)
    val text = "the quick brown fox jumps over the lazy dog"
    Seq(Tuple1(text)).toDF("t").createOrReplaceTempView("wtxt")
    val sql = spark.sql("SELECT winnow_set(t, 5, 4) AS f FROM wtxt")
      .first().getSeq[String](0)
    val api = Seq(Tuple1(text)).toDF("t")
      .select(WinnowSet.winnowSet(col("t"), 5, 4)).first().getSeq[String](0)
    assert(sql === api && sql.nonEmpty)
  }

  test("winnow_set rejects non-literal k/w at plan time") {
    graft.GraftExtensions.register(spark)
    Seq((1, "abcdef")).toDF("n", "t").createOrReplaceTempView("wbad")
    val e = intercept[Exception] {
      spark.sql("SELECT winnow_set(t, n, 4) FROM wbad").collect()
    }
    assert(e.getMessage.contains("INT literal") ||
      Option(e.getCause).exists(_.getMessage.contains("INT literal")))
  }
  test("minhash_sig from SQL equals the Column-API kernel") {
    graft.GraftExtensions.register(spark)
    Seq(Tuple1(Seq("a b c", "b c d", "c d e")))
      .toDF("sh").createOrReplaceTempView("mhsh")
    val sql = spark.sql("SELECT minhash_sig(sh, 8) AS s FROM mhsh")
      .first().getSeq[String](0)
    val api = Seq(Tuple1(Seq("a b c", "b c d", "c d e"))).toDF("sh")
      .select(MinHashSig.minHashSig(col("sh"), 8)).first().getSeq[String](0)
    assert(sql === api && sql.size === 8)
  }

  test("minhash_sig rejects a NULL k literal with a clear message") {
    // CAST(NULL AS INT) is foldable IntegerType; without the explicit
    // null check it would unbox to k=0 and surface a confusing
    // "got k=0" size error instead of naming the null argument
    graft.GraftExtensions.register(spark)
    Seq(Tuple1(Seq("a b c"))).toDF("sh").createOrReplaceTempView("mhnull")
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig(sh, CAST(NULL AS INT)) FROM mhnull").collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("non-null INT literal"), msgs)
  }
}
