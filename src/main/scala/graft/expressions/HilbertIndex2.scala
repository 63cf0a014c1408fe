package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** `hilbert2(x, y, bits) -> bigint`: Hilbert-curve index of a 2-D point
  * at `bits` bits per dimension — the locality-preserving alternative
  * to [[graft.operators.Layout.zValue2]]'s Morton order. Both
  * linearize a 2-D key space for range-partitioned writes and min/max
  * file skipping; the Hilbert walk additionally guarantees EVERY
  * consecutive pair of indices is grid-adjacent (Manhattan distance 1,
  * spec-pinned), so a contiguous index range maps to a compact tile
  * with no Morton "jumps" — on quadrant-misaligned contiguous ranges
  * (real file boundaries land by size, not by quadrant) bounding-box
  * envelopes measure ~35% tighter than z-order (LayoutSpec, 32×32
  * grid, 100-cell ranges: 1384 vs 2112 total bbox area).
  *
  * Algorithm: the classic quadrant-local bit-interleave walk (Hilbert
  * 1891; implementation shape per Warren, Hacker's Delight §16) —
  * per level, emit the quadrant's 2-bit gray code, reduce to quadrant
  * coordinates, and rotate/reflect the frame. Iterative with carried
  * state, so it is a real custom-codegen'd Expression (the
  * [[CosineSimilarity]] ladder rung), not a built-in composition like
  * the Morton interleave: `doGenCode` inlines the loop into
  * whole-stage codegen. Inputs mask to `bits` bits (the zValue2
  * wrap-don't-corrupt convention); nulls propagate.
  *
  * The identical arithmetic is emitted as engine-portable unrolled SQL
  * by [[graft.operators.Layout.hilbertSqlLevels]] — the q54-style
  * oracle contract.
  */
case class HilbertIndex2(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType | IntegerType, LongType | IntegerType, IntegerType)
          if third.foldable =>
        val b = third.eval()
        if (b != null && b.asInstanceOf[Int] >= 1 && b.asInstanceOf[Int] <= 31)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure("bits must be an int literal in [1, 31]")
      case (x, y, b) => TypeCheckResult.TypeCheckFailure(
        s"hilbert2 expects (integral x, integral y, foldable int bits), got ($x, $y, $b)")
    }

  @transient private lazy val bits: Int = third.eval().asInstanceOf[Int]

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert2"

  private def toLong(v: Any): Long = v match {
    case i: java.lang.Integer => i.longValue()
    case l: java.lang.Long => l.longValue()
  }

  override protected def nullSafeEval(xv: Any, yv: Any, bv: Any): Any = {
    val mask = (1L << bits) - 1
    var x = toLong(xv) & mask
    var y = toLong(yv) & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      x &= s - 1
      y &= s - 1
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xa, ya, _) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      val mask = (1L << bits) - 1
      s"""
         |long $x = ((long) $xa) & ${mask}L;
         |long $y = ((long) $ya) & ${mask}L;
         |long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  $x &= $s - 1;
         |  $y &= $s - 1;
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): HilbertIndex2 =
    copy(first = newFirst, second = newSecond, third = newThird)
}
