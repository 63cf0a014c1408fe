package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Levenshtein distance over TOKEN arrays (unit-cost substitution /
  * insertion / deletion) — the WER kernel. Spark's builtin
  * `levenshtein` is character-level over strings; word error rate
  * needs the same DP over words, and joining tokens back into a string
  * would let edits split tokens. O(Lа·Lb) time, two-row space,
  * interned-id equality in the inner loop, map-side like the rest of
  * the eval family ([[NgramOverlapStats]], [[LcsLength]]).
  *
  * The DP VALUE is canonical (the distance is unique), so a SQL oracle
  * replaying the recurrence matches exactly. Null elements are
  * skipped; null arrays → null.
  */
case class TokenEditDistance(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"token_edit_distance expects (array<string>, array<string>), got ($a, $b)")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "token_edit_distance"

  private def tokensOf(arr: ArrayData): Array[String] = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[String](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) out.add(arr.getUTF8String(i).toString)
      i += 1
    }
    out.toArray(new Array[String](out.size()))
  }

  def compute(aArr: ArrayData, bArr: ArrayData): Long = {
    val a0 = tokensOf(aArr)
    val b0 = tokensOf(bArr)
    if (a0.length == 0) return b0.length.toLong
    if (b0.length == 0) return a0.length.toLong
    // DP row over the SHORTER side (distance is symmetric)
    val (aT, bT) = if (a0.length >= b0.length) (a0, b0) else (b0, a0)
    val dict = new java.util.HashMap[String, Integer]((aT.length + bT.length) * 2)
    def intern(toks: Array[String]): Array[Int] = {
      val out = new Array[Int](toks.length)
      var i = 0
      while (i < toks.length) {
        var id = dict.get(toks(i))
        if (id == null) { id = dict.size; dict.put(toks(i), id) }
        out(i) = id
        i += 1
      }
      out
    }
    val a = intern(aT)
    val b = intern(bT)
    val m = b.length
    var prev = Array.tabulate(m + 1)(identity) // dp[0][j] = j
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= a.length) {
      cur(0) = i
      val ai = a(i - 1)
      var j = 1
      while (j <= m) {
        val sub = prev(j - 1) + (if (ai == b(j - 1)) 0 else 1)
        val del = prev(j) + 1
        val ins = cur(j - 1) + 1
        cur(j) = math.min(sub, math.min(del, ins))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m).toLong
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("tokenEditDistance", this, classOf[TokenEditDistance].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $self.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenEditDistance =
    copy(left = newLeft, right = newRight)
}
