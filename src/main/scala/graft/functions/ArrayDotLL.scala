package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the integer-array dot product used by
  * every exact-ANN path (floor-scaled embedding domain, PipelineOps):
  * semantically identical to the column-API fold
  * `aggregate(zip_with(a, b, (x, y) => x * y), 0L, (acc, x) => acc + x)` —
  * the same left-to-right summation order, integer-exact, so every DuckDB
  * twin is untouched — but evaluated as ONE tight JVM loop per row instead
  * of ~2·dims interpreted higher-order-function dispatches (zip_with and
  * aggregate lambdas never enter whole-stage codegen; this does, via the
  * same static-call pattern as [[StrHash31]]).
  *
  * Defined for equal-length non-null arrays (the embedding tables by
  * construction; dimension mismatches fail loudly).
  */
case class ArrayDotLL(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_dot_ll needs two array<bigint> arguments, got $l, $r")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "array_dot_ll"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    ArrayDotLL.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ArrayDotLL.dot($a, $b)")

  protected override def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotLL =
    copy(left = newLeft, right = newRight)
}

object ArrayDotLL {
  /** Called from both interpreted eval and generated code. NULL elements
    * are rejected loudly: ArrayData.getLong on a null slot silently reads
    * 0, which would diverge from the HOF fold / DuckDB twin (both
    * propagate NULL) — this expression's contract is bit-equality or an
    * error, never a silently different number.
    */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"array_dot_ll dimension mismatch: $n vs ${b.numElements()}")
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"array_dot_ll: null element at index $i")
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }
}
