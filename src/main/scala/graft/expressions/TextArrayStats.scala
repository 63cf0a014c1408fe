package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass token statistics over an `array<string>` column:
  * `struct<n_tokens int, n_unique int, sum_token_len bigint, n_stopwords
  * int>` — the inner kernel of the corpus quality-stats family.
  *
  * Replaces four separate declarative computations (`size`,
  * `size(array_distinct)`, `aggregate(+length)`, `size(filter(isin))`)
  * that each re-evaluated their per-element lambda INTERPRETED (Catalyst
  * higher-order functions don't codegen their function bodies — the
  * measured ~100× per-element penalty, SURVEY §4.3), and, worse, forced
  * the upstream `split` to run once per statistic. One array scan, JIT'd
  * loop body, split evaluated once.
  *
  * Value-compatible with the declarative forms on split() output (which
  * never contains null elements): token length is `numChars` (code
  * points, = `length()`), uniqueness and stopword membership are binary
  * UTF8String equality (= `array_distinct` / `isInCollection`). Null
  * array elements, if any: counted in n_tokens, skipped elsewhere.
  *
  * The stopword list (right argument) must be a foldable array<string>;
  * it is evaluated once at plan time into a hash set.
  */
case class TextArrayStats(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"text_array_stats expects (array<string>, foldable array<string>), got ($l, $r)")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_unique", IntegerType, nullable = false),
    StructField("sum_token_len", LongType, nullable = false),
    StructField("n_stopwords", IntegerType, nullable = false)))

  override def prettyName: String = "text_array_stats"

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    val arr = right.eval().asInstanceOf[ArrayData]
    if (arr != null) {
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) s.add(arr.getUTF8String(i))
        i += 1
      }
    }
    s
  }

  /** Shared by interpreted eval and codegen (the generated code calls
    * this static-shaped helper via a reference object — the loop body is
    * identical either way, so there is nothing to gain from emitting it
    * inline, and nothing to collide in Janino).
    */
  def compute(toks: ArrayData): InternalRow = {
    val n = toks.numElements()
    val seen = new java.util.HashSet[UTF8String]()
    var sumLen = 0L
    var nStop = 0
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val w = toks.getUTF8String(i)
        seen.add(w)
        sumLen += w.numChars()
        if (stopSet.contains(w)) nStop += 1
      } else seen.add(null)
      i += 1
    }
    new GenericInternalRow(Array[Any](n, seen.size(), sumLen, nStop))
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("textArrayStats", this, classOf[TextArrayStats].getName)
    nullSafeCodeGen(ctx, ev, (a, _) => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TextArrayStats =
    copy(left = newLeft, right = newRight)
}
