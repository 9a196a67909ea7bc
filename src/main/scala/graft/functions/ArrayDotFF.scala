package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native float-array dot product in double — the float-domain sibling of
  * [[ArrayDotLL]]/[[ArrayDotLD]], used by the brute cosine baseline
  * (PipelineOps.annCosine) whose vectors are `array<float>`. Bit-identical
  * to the column fold
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  * 0.0, (acc, x) => acc + x)`: each element is widened float→double (a
  * value-preserving cast), multiplied in double, and accumulated left to
  * right with the same IEEE rounding per step — so the existing DuckDB
  * twin and every recorded hash are untouched; the fold just runs as ONE
  * tight JVM loop inside whole-stage codegen instead of ~2·dims
  * interpreted HOF dispatches per row (zip_with/aggregate lambdas are
  * CodegenFallback — the same pathology class the flat PIP predicate
  * removed in round 5).
  */
case class ArrayDotFF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_dot_ff needs two array<float> arguments, got $l, $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot_ff"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    ArrayDotFF.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ArrayDotFF.dot($a, $b)")

  protected override def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotFF =
    copy(left = newLeft, right = newRight)
}

object ArrayDotFF {
  /** NULL elements fail loudly — same bit-equality-or-error contract as
    * [[ArrayDotLL.dot]].
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"array_dot_ff dimension mismatch: $n vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"array_dot_ff: null element at index $i")
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }
}

/** Float-array × double-array dot product — drives the LSH hyperplane
  * signs (PipelineOps.bucketCol: vector × baked double hyperplane).
  * Bit-identical to `aggregate(zip_with(v, lit(cs), (x, c) =>
  * x.cast(double) * c), 0.0, (acc, x) => acc + x)` — same widen, same
  * element order, same IEEE rounding per step, so every bucket (and
  * therefore every LSH oracle) is unchanged.
  */
case class ArrayDotFD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_dot_fd needs (array<float>, array<double>), got $l, $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot_fd"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    ArrayDotFD.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ArrayDotFD.dot($a, $b)")

  protected override def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotFD =
    copy(left = newLeft, right = newRight)
}

object ArrayDotFD {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"array_dot_fd dimension mismatch: $n vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"array_dot_fd: null element at index $i")
      s += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    s
  }
}
