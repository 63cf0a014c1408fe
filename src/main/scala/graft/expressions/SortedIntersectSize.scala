package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native codegen'd intersection size of two SORTED long arrays — the
  * inner loop of Jaccard verification over hashed token sets. The built-in
  * `array_intersect` builds a hash set per call; for pre-sorted inputs a
  * two-pointer merge is O(n+m) with zero allocation, and the generated
  * loop inlines into whole-stage codegen.
  *
  * PRECONDITION: both arrays ascending-sorted and duplicate-free (as
  * produced by `array_sort(array_distinct(...))` / the dedup operators).
  * Unsorted input silently undercounts — callers own the invariant.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_size expects (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_intersect_size"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0
    val nx = x.numElements(); val ny = y.numElements()
    while (i < nx && j < ny) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { n += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    n
  }

  // every local via ctx.freshName — two instances inlined into one
  // whole-stage-codegen function must not redeclare the same Java locals
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      s"""
         |int $i = 0, $j = 0, $n = 0;
         |int $nx = $a.numElements(), $ny = $b.numElements();
         |while ($i < $nx && $j < $ny) {
         |  long $xi = $a.getLong($i); long $yj = $b.getLong($j);
         |  if ($xi == $yj) { $n++; $i++; $j++; }
         |  else if ($xi < $yj) $i++;
         |  else $j++;
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}
