package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass n-gram repetition counter over an `array<string>`
  * token column: `struct<n_grams bigint, top_cnt bigint, distinct_cnt
  * bigint>` — the kernel behind
  * [[graft.functions.TextFunctions.repetitionStats]].
  *
  * The declarative formulation (HOF-built n-gram array → explode →
  * (doc, gram) hash agg → (doc) hash agg) pays an interpreted lambda
  * per element AND two corpus-sized shuffles; this kernel is one local
  * hash-map pass per document — ZERO shuffle, the stats never leave the
  * row. Counting keys on the exact joined gram text (single-space
  * separator, same as `concat_ws(" ", ...)`), not on a hash — identical
  * semantics to the declarative form and the q64 oracle, no collision
  * caveat. Null elements are treated as absent (they never occur in
  * `split` output, the declared input contract).
  *
  * The n-gram order (right argument) must be a foldable positive int.
  */
case class NgramRepetition(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        val n = right.eval()
        if (n != null && n.asInstanceOf[Int] >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure("ngram order must be a positive int literal")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"ngram_repetition expects (array<string>, foldable int), got ($l, $r)")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("top_cnt", LongType, nullable = false),
    StructField("distinct_cnt", LongType, nullable = false),
    // Σ c·ln(c) over the distinct-gram counts: together with n_grams this
    // yields Shannon entropy (ln N − Σc·ln c / N)/ln 2 without a second
    // pass — the same hash map serves repetition AND entropy signals
    StructField("sum_c_ln_c", DoubleType, nullable = false)))

  override def prettyName: String = "ngram_repetition"

  @transient private lazy val n: Int = right.eval().asInstanceOf[Int]
  @transient private lazy val space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and codegen (same rationale as
    * [[TextArrayStats.compute]]).
    */
  def compute(toks: ArrayData): InternalRow = {
    val len = toks.numElements()
    val total = math.max(0, len - (n - 1))
    val counts = new java.util.HashMap[UTF8String, Long]()
    var top = 0L
    var i = 0
    while (i < total) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = if (toks.isNullAt(i + j)) UTF8String.EMPTY_UTF8
                   else toks.getUTF8String(i + j)
        j += 1
      }
      val gram = UTF8String.concatWs(space, parts: _*)
      val c = counts.merge(gram, 1L, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    var sumCLnC = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next(); sumCLnC += c * math.log(c.toDouble) }
    new GenericInternalRow(Array[Any](total.toLong, top, counts.size().toLong, sumCLnC))
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("ngramRepetition", this, classOf[NgramRepetition].getName)
    nullSafeCodeGen(ctx, ev, (a, _) => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramRepetition =
    copy(left = newLeft, right = newRight)
}
