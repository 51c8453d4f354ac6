package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native vector kernels for the embedding operators. The builtin
  * composition (`aggregate(zip_with(a, b, multiply), 0, add)`) is
  * evaluated per element through interpreted higher-order lambdas —
  * measured as the dominant cost of every ANN/near-dup query — while
  * these expressions run the loop in one compiled call per row and
  * keep the stage inside WholeStageCodegen.
  *
  * Numeric contract (the oracle depends on it): accumulation is a
  * left-to-right fold over doubles in ascending element order, floats
  * widened exactly — bit-identical to the HOF composition it replaces
  * and to DuckDB's `list_dot_product` on `DOUBLE[]`.
  *
  * Null contract: mismatched lengths yield NULL (the zip_with
  * composition nulls out the same way via null padding).
  */
object VecExprs {

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def checkVec(name: String, e: Expression): TypeCheckResult = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name: argument must be ARRAY<FLOAT> or ARRAY<DOUBLE>, got ${other.sql}")
  }

  @inline private def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Σ a_i * b_i, or null on length mismatch. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0d
    var i = 0
    while (i < n) { acc += get(a, i, aFloat) * get(b, i, bFloat); i += 1 }
    acc
  }

  /** Σ (a_i − b_i)², or null on length mismatch. */
  def l2sq(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0d
    var i = 0
    while (i < n) {
      val d = get(a, i, aFloat) - get(b, i, bFloat)
      acc += d * d
      i += 1
    }
    acc
  }

  private val one = UTF8String.fromString("1")
  private val zero = UTF8String.fromString("0")

  /** All SRP sign bits in one pass: bit p = (Σ_j signs(p)(j) * v_j ≥ 0),
    * as "0"/"1" strings (the band-key alphabet of Dedup.lshBands).
    * Null when the vector length differs from the hyperplane width.
    */
  def srpBits(v: ArrayData, signs: Array[Array[Double]], isFloat: Boolean): GenericArrayData = {
    val dim = v.numElements()
    if (signs.length == 0 || signs(0).length != dim) return null
    val out = new Array[Any](signs.length)
    var p = 0
    while (p < signs.length) {
      val row = signs(p)
      var acc = 0.0d
      var j = 0
      while (j < dim) { acc += row(j) * get(v, j, isFloat); j += 1 }
      out(p) = if (acc >= 0d) one else zero
      p += 1
    }
    new GenericArrayData(out)
  }

  case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = {
      val l = checkVec("vec_dot", left)
      if (l.isFailure) l else checkVec("vec_dot", right)
    }
    private lazy val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
    override protected def nullSafeEval(a: Any, b: Any): Any =
      dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lf, rf)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val boxed = ctx.freshName("dot")
        s"""java.lang.Double $boxed = graft.functions.VecExprs.dot($a, $b, $lf, $rf);
           |${ev.isNull} = $boxed == null;
           |${ev.value} = ${ev.isNull} ? 0.0d : $boxed.doubleValue();""".stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  case class VecL2Sq(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = {
      val l = checkVec("vec_l2sq", left)
      if (l.isFailure) l else checkVec("vec_l2sq", right)
    }
    private lazy val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
    override protected def nullSafeEval(a: Any, b: Any): Any =
      l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lf, rf)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val boxed = ctx.freshName("l2")
        s"""java.lang.Double $boxed = graft.functions.VecExprs.l2sq($a, $b, $lf, $rf);
           |${ev.isNull} = $boxed == null;
           |${ev.value} = ${ev.isNull} ? 0.0d : $boxed.doubleValue();""".stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** `signs` is an IndexedSeq (structural equality) so two instances
    * built from the same seed canonicalize equal — exchange reuse and
    * subexpression elimination keep working.
    */
  case class SrpBitsExpr(child: Expression, signs: IndexedSeq[IndexedSeq[Double]])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = checkVec("srp_bits", child)
    private lazy val isFloat = elemIsFloat(child)
    @transient private lazy val signsArr: Array[Array[Double]] =
      signs.map(_.toArray).toArray
    override protected def nullSafeEval(v: Any): Any =
      srpBits(v.asInstanceOf[ArrayData], signsArr, isFloat)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("srpSigns", signsArr, "double[][]")
      nullSafeCodeGen(ctx, ev, v =>
        s"""${ev.value} = graft.functions.VecExprs.srpBits($v, $ref, $isFloat);
           |${ev.isNull} = ${ev.value} == null;""".stripMargin)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // ----------------------------------------------------- Column API
  def vecDot(a: Column, b: Column): Column =
    GraftBridge.column(VecDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  def vecL2Sq(a: Column, b: Column): Column =
    GraftBridge.column(VecL2Sq(GraftBridge.expression(a), GraftBridge.expression(b)))

  def srpBitsCol(v: Column, signs: IndexedSeq[IndexedSeq[Double]]): Column =
    GraftBridge.column(SrpBitsExpr(GraftBridge.expression(v), signs))
}
