package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Length of the longest common subsequence of two token arrays — the
  * ROUGE-L kernel (Lin '04 §3). Classic O(Lc·Lr) time, O(min) space
  * two-row DP over interned token ids (id equality instead of string
  * equality in the inner loop; the intern pass is linear).
  *
  * Both arrays live in the same row, so the metric is map-side and
  * shuffle-free, like [[NgramOverlapStats]]. Null elements are skipped;
  * null arrays → null (BinaryExpression contract). The DP value is
  * canonical (LCS LENGTH is unique even when the subsequence isn't),
  * so a SQL oracle replaying the same recurrence matches exactly.
  */
case class LcsLength(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"lcs_length expects (array<string>, array<string>), got ($a, $b)")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "lcs_length"

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
    if (a0.length == 0 || b0.length == 0) return 0L
    // the DP row is over the SHORTER side
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
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= a.length) {
      val ai = a(i - 1)
      var j = 1
      while (j <= m) {
        cur(j) =
          if (ai == b(j - 1)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
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
    val self = ctx.addReferenceObj("lcsLength", this, classOf[LcsLength].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $self.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsLength =
    copy(left = newLeft, right = newRight)
}
