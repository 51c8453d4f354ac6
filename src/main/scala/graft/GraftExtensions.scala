package graft

import graft.functions.TimeBucket
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions exposing graft's native expressions to SQL users
  * (`--conf spark.sql.extensions=graft.GraftExtensions`):
  *
  *   SELECT time_bucket(ts, 3600000000, 0) ...
  *
  * The idiomatic injection point for engine extensions — no fork, no
  * UDF registration at call sites.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.timeBucketDescriptor)
    ext.injectFunction(GraftExtensions.inflateDescriptor)
    ext.injectFunction(GraftExtensions.charNgramSetDescriptor)
    ext.injectFunction(GraftExtensions.nfcNormalizeDescriptor)
    ext.injectFunction(GraftExtensions.vecDotDescriptor)
    ext.injectFunction(GraftExtensions.winnowSetDescriptor)
    ext.injectFunction(GraftExtensions.minHashSigDescriptor)
    ext.injectFunction(GraftExtensions.cdcGearChunksDescriptor)
    ext.injectFunction(GraftExtensions.acCountDescriptor)
  }
}

object GraftExtensions {
  val timeBucketDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("time_bucket"),
    new ExpressionInfo(classOf[TimeBucket].getName, "time_bucket"),
    (children: Seq[Expression]) => {
      if (children.size != 3) throw new IllegalArgumentException(
        s"time_bucket(ts, widthUs, originUs) takes 3 arguments, got ${children.size}")
      TimeBucket(children(0),
      org.apache.spark.sql.catalyst.expressions.Cast(children(1), org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.catalyst.expressions.Cast(children(2), org.apache.spark.sql.types.LongType))
    })

  val inflateDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_inflate"),
    new ExpressionInfo(classOf[graft.functions.Inflate].getName, "graft_inflate"),
    (children: Seq[Expression]) => {
      if (children.size != 1) throw new IllegalArgumentException(
        s"graft_inflate(bin) takes 1 argument, got ${children.size}")
      graft.functions.Inflate(children.head)
    })

  val charNgramSetDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("char_ngram_set"),
    new ExpressionInfo(classOf[graft.functions.CharNgramSet].getName, "char_ngram_set"),
    (children: Seq[Expression]) => {
      if (children.size != 2) throw new IllegalArgumentException(
        s"char_ngram_set(text, n) takes 2 arguments, got ${children.size}")
      val n = children(1) match {
        case e if e.foldable && e.dataType == org.apache.spark.sql.types.IntegerType =>
          e.eval().asInstanceOf[Int]
        case other => throw new IllegalArgumentException(
          s"char_ngram_set: n must be an INT literal, got ${other.sql}")
      }
      graft.functions.CharNgramSet(children.head, n)
    })

  val nfcNormalizeDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[graft.functions.NfcNormalize].getName, "nfc_normalize"),
    (children: Seq[Expression]) => {
      if (children.size != 1) throw new IllegalArgumentException(
        s"nfc_normalize(text) takes 1 argument, got ${children.size}")
      graft.functions.NfcNormalize(children.head)
    })

  /** vec_dot(a, b): the codegen'd double dot product every ANN query
    * runs on — SQL users get the same kernel the DataFrame API uses
    * (`SELECT vec_dot(embedding, q.qv) ...`), not an interpreted
    * `aggregate(zip_with(...))` lambda.
    */
  val vecDotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[graft.functions.VecExprs.VecDot].getName, "vec_dot"),
    (children: Seq[Expression]) => {
      if (children.size != 2) throw new IllegalArgumentException(
        s"vec_dot(a, b) takes 2 arguments, got ${children.size}")
      graft.functions.VecExprs.VecDot(children(0), children(1))
    })

  /** winnow_set(text, k, w): the one-pass winnowing fingerprint kernel
    * (k-gram rolling hash, window-w minima). k and w must be INT
    * literals — they size per-slot buffers at plan time.
    */
  val winnowSetDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("winnow_set"),
    new ExpressionInfo(classOf[graft.functions.WinnowSet].getName, "winnow_set"),
    (children: Seq[Expression]) => {
      if (children.size != 3) throw new IllegalArgumentException(
        s"winnow_set(text, k, w) takes 3 arguments, got ${children.size}")
      def intLit(e: Expression, name: String): Int = e match {
        case l if l.foldable && l.dataType == org.apache.spark.sql.types.IntegerType =>
          l.eval() match {
            // a NULL int literal is foldable too; unboxing it would
            // silently read as 0 and surface a confusing size error
            case null => throw new IllegalArgumentException(
              s"winnow_set: $name must be a non-null INT literal, got NULL")
            case v => v.asInstanceOf[Int]
          }
        case other => throw new IllegalArgumentException(
          s"winnow_set: $name must be an INT literal, got ${other.sql}")
      }
      graft.functions.WinnowSet(children.head,
        intLit(children(1), "k"), intLit(children(2), "w"))
    })

  /** minhash_sig(shingles, k): the k-component md5x2-slice32 minhash
    * signature over a shingle array in one scan-local pass (see
    * [[graft.functions.MinHashSig]]). k must be an INT literal 1..8.
    */
  val minHashSigDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[graft.functions.MinHashSig].getName, "minhash_sig"),
    (children: Seq[Expression]) => {
      if (children.size != 2) throw new IllegalArgumentException(
        s"minhash_sig(shingles, k) takes 2 arguments, got ${children.size}")
      val k = children(1) match {
        case l if l.foldable && l.dataType == org.apache.spark.sql.types.IntegerType =>
          l.eval() match {
            case null => throw new IllegalArgumentException(
              "minhash_sig: k must be a non-null INT literal, got NULL")
            case v => v.asInstanceOf[Int]
          }
        case other => throw new IllegalArgumentException(
          s"minhash_sig: k must be an INT literal, got ${other.sql}")
      }
      graft.functions.MinHashSig(children.head, k)
    })

  /** cdc_gear_chunks(text, minLen, maxLen, maskBits): the gear-hash
    * content-defined chunking kernel — O(1)/byte where the oracle's
    * md5-window form pays a digest per position. Sizing args must be
    * INT literals.
    */
  val cdcGearChunksDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cdc_gear_chunks"),
    new ExpressionInfo(classOf[graft.functions.CdcGearChunks].getName, "cdc_gear_chunks"),
    (children: Seq[Expression]) => {
      if (children.size != 4) throw new IllegalArgumentException(
        s"cdc_gear_chunks(text, minLen, maxLen, maskBits) takes 4 arguments, got ${children.size}")
      def intLit(e: Expression, name: String): Int = e match {
        case l if l.foldable && l.dataType == org.apache.spark.sql.types.IntegerType =>
          l.eval() match {
            case null => throw new IllegalArgumentException(
              s"cdc_gear_chunks: $name must be a non-null INT literal, got NULL")
            case v => v.asInstanceOf[Int]
          }
        case other => throw new IllegalArgumentException(
          s"cdc_gear_chunks: $name must be an INT literal, got ${other.sql}")
      }
      graft.functions.CdcGearChunks(children.head,
        intLit(children(1), "minLen"), intLit(children(2), "maxLen"),
        intLit(children(3), "maskBits"))
    })

  /** ac_count(text, array('t1','t2',…)): Aho-Corasick dictionary match
    * count. The dictionary must be a foldable STRING array — it sizes
    * and builds the automaton at plan time.
    */
  val acCountDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("ac_count"),
    new ExpressionInfo(classOf[graft.functions.AcCount].getName, "ac_count"),
    (children: Seq[Expression]) => {
      if (children.size != 2) throw new IllegalArgumentException(
        s"ac_count(text, dictionary) takes 2 arguments, got ${children.size}")
      val pats = children(1) match {
        case e if e.foldable && e.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
            e.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType ==
              org.apache.spark.sql.types.StringType =>
          val arr = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          (0 until arr.numElements()).map(i =>
            arr.getUTF8String(i).toString)
        case other => throw new IllegalArgumentException(
          s"ac_count: dictionary must be a STRING array literal, got ${other.sql}")
      }
      graft.functions.AcCount(children.head, pats)
    })

  private val all = Seq(timeBucketDescriptor, inflateDescriptor,
    charNgramSetDescriptor, nfcNormalizeDescriptor, vecDotDescriptor,
    winnowSetDescriptor, cdcGearChunksDescriptor, acCountDescriptor,
    minHashSigDescriptor)

  /** Register on an existing session (tests / notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
