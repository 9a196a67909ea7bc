package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native long-array × double-array dot product — the mixed-domain sibling
  * of [[ArrayDotLL]], used by the IVF assignment / bound passes where one
  * side is an integer embedding and the other a double k-means center.
  * Bit-identical to the column fold
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y), 0.0,
  * (acc, x) => acc + x)`: same left-to-right IEEE summation order, so the
  * cluster geometry (and therefore every pruning bound) is unchanged —
  * just computed in one tight loop inside whole-stage codegen instead of
  * ~2·dims interpreted HOF dispatches.
  */
case class ArrayDotLD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_dot_ld needs (array<bigint>, array<double>), got $l, $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot_ld"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    ArrayDotLD.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ArrayDotLD.dot($a, $b)")

  protected override def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotLD =
    copy(left = newLeft, right = newRight)
}

object ArrayDotLD {
  /** NULL elements fail loudly — same bit-equality-or-error contract as
    * [[ArrayDotLL.dot]].
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"array_dot_ld dimension mismatch: $n vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"array_dot_ld: null element at index $i")
      s += a.getLong(i).toDouble * b.getDouble(i)
      i += 1
    }
    s
  }
}

/** Native squared-Euclidean distance between a long-array embedding and a
  * double-array center — bit-identical to the column fold
  * `aggregate(zip_with(v, cv, (a, b) => { val d = a.cast(double) - b;
  * d * d }), 0.0, (acc, x) => acc + x)` (same element order, same IEEE
  * rounding per step). Drives the member-radius stat of the IVF index.
  */
case class ArrayDist2LD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_dist2_ld needs (array<bigint>, array<double>), got $l, $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dist2_ld"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    ArrayDist2LD.dist2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ArrayDist2LD.dist2($a, $b)")

  protected override def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDist2LD =
    copy(left = newLeft, right = newRight)
}

object ArrayDist2LD {
  def dist2(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"array_dist2_ld dimension mismatch: $n vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"array_dist2_ld: null element at index $i")
      val d = a.getLong(i).toDouble - b.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }
}
