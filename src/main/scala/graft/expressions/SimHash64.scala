package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd 64-bit SimHash over a pre-hashed token
  * `array<bigint>` column: bit b of the output is 1 iff the sum over
  * tokens of ±1 (the sign of bit b of the token hash) is positive —
  * Charikar '02, identical math to the explode + 64-conditional-sums
  * aggregate in [[graft.operators.Dedup.simhashTable]] and the
  * interpreted [[graft.operators.Dedup.simhash64]] HOF (DedupSpec
  * asserts agreement).
  *
  * The point at scale: the aggregate formulation EXPLODES the corpus to
  * one row per (doc, token) and shuffles it into a hash aggregate; this
  * expression computes the same value per row, map-side, zero shuffle
  * and zero row amplification. O(64·n) JIT'd bit ops per document.
  *
  * Empty array → 0L (every bit sum is 0, not positive — same as the
  * aggregate's no-rows group never existing; callers treat 0-token docs
  * upstream). Null array → null.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<bigint> of pre-hashed tokens, got $t")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(a: Any): Any = {
    val toks = a.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val sums = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = toks.getLong(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
      j += 1
    }
    var sh = 0L
    var b = 0
    while (b < 64) { if (sums(b) > 0) sh |= 1L << b; b += 1 }
    sh
  }

  // all locals via ctx.freshName (multi-instance inlining, as elsewhere)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val sums = ctx.freshName("sums")
      val h = ctx.freshName("h")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val sh = ctx.freshName("sh")
      s"""
         |int $n = $a.numElements();
         |int[] $sums = new int[64];
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $a.getLong($j);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $sums[$b]++; else $sums[$b]--;
         |  }
         |}
         |long $sh = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($sums[$b] > 0) $sh |= 1L << $b;
         |}
         |${ev.value} = $sh;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
