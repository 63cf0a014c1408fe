package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Intersection ELEMENTS of two SORTED long arrays — the array-valued
  * sibling of [[SortedIntersectSize]], for callers that need the common
  * members themselves (the triangle edge-iterator credits each common
  * neighbour individually). Two-pointer merge, O(n+m), one output
  * allocation; the built-in `array_intersect` hash-builds per call,
  * which dominated q129's closing step.
  *
  * PRECONDITION: both arrays ascending-sorted and duplicate-free.
  * Unsorted input silently drops members — callers own the invariant.
  */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect expects (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "sorted_intersect"

  def compute(a: ArrayData, b: ArrayData): ArrayData = {
    val nx = a.numElements()
    val ny = b.numElements()
    val out = new Array[Long](math.min(nx, ny))
    var i = 0; var j = 0; var n = 0
    while (i < nx && j < ny) {
      val xi = a.getLong(i); val yj = b.getLong(j)
      if (xi == yj) { out(n) = xi; n += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    val res = new Array[Any](n)
    var k = 0
    while (k < n) { res(k) = out(k); k += 1 }
    new GenericArrayData(res)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sortedIntersect", this, classOf[SortedIntersect].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $self.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersect =
    copy(left = newLeft, right = newRight)
}
