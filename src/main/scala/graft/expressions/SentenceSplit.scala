package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sentence segmentation of a string column — `array<string>` of the
  * UAX#29 sentence SPANS from `java.text.BreakIterator`'s sentence
  * instance (`Locale.ROOT` — sentence rules are locale-invariant in
  * the JDK), VERBATIM: no trimming, no case folding, every character
  * of the input appears in exactly one span in order, so
  * `concat(sentences) == input` is an exact identity (the q217 oracle
  * replays it as an md5 equality — the [[UnicodeTokens]] round-trip
  * convention for segmentation DuckDB can't restate). Empty string →
  * empty array; null → null.
  *
  * This is the boundary primitive a RAG/chunking pipeline needs:
  * fixed token windows ([[graft.operators.Chunking.chunkTokens]]) cut
  * mid-sentence by construction; [[SentenceChunks]] packs these spans
  * instead.
  *
  * Scale shape: map-side, one pass per row; the BreakIterator (not
  * thread-safe) is reused via a ThreadLocal.
  */
case class SentenceSplit(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"sentence_split expects string, got $t")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "sentence_split"

  def compute(s: UTF8String): GenericArrayData =
    new GenericArrayData(
      SentenceSplit.spans(s.toString).map(UTF8String.fromString))

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sentenceSplit", this, classOf[SentenceSplit].getName)
    defineCodeGen(ctx, ev, c => s"$self.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SentenceSplit =
    copy(child = newChild)
}

object SentenceSplit {

  private val iter = new ThreadLocal[java.text.BreakIterator] {
    override def initialValue(): java.text.BreakIterator =
      java.text.BreakIterator.getSentenceInstance(java.util.Locale.ROOT)
  }

  /** Verbatim sentence spans of `s` (exposed for [[SentenceChunks]] and
    * the spec's hand-segmented fixtures).
    */
  def spans(s: String): Array[String] = {
    if (s.isEmpty) return Array.empty
    val bi = iter.get()
    bi.setText(s)
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var start = bi.first()
    var end = bi.next()
    while (end != java.text.BreakIterator.DONE) {
      out += s.substring(start, end)
      start = end
      end = bi.next()
    }
    out.toArray
  }

  /** Whitespace-token count of a span — the SAME counting rule as the
    * whitespace tokenizer (runs of `Character.isWhitespace` delimit;
    * empties don't count), so budget arithmetic matches what a
    * token-window consumer of the chunk will see.
    */
  def tokenCount(s: String): Int = {
    var n = 0
    var inTok = false
    var i = 0
    while (i < s.length) {
      val ws = Character.isWhitespace(s.charAt(i))
      if (!ws && !inTok) { n += 1; inTok = true }
      else if (ws) inTok = false
      i += 1
    }
    n
  }
}

/** Sentence-aware chunking — `array<struct<chunk, n_sentences,
  * n_tokens>>`: consecutive [[SentenceSplit]] spans packed greedily
  * into chunks of at most `maxTokens` whitespace tokens, NEVER
  * splitting inside a sentence. A single sentence over the budget
  * becomes its own (oversized) chunk — the documented exception the
  * budget verdict carries (`n_tokens ≤ maxTokens OR n_sentences = 1`).
  * Chunks concatenate consecutive verbatim spans, so
  * `concat(chunks) == input` exactly, and Σ n_tokens = the document's
  * whitespace token count. Empty string → empty array; null → null.
  *
  * Packing is inherently sequential per document (a running-sum reset
  * is not a cumsum), which is why it lives in the one-pass kernel
  * instead of window arithmetic; across documents it is embarrassingly
  * parallel — map-side, no shuffle.
  */
case class SentenceChunks(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sentence_chunks expects (string, int), got ($l, $r)")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk", StringType, nullable = false),
    StructField("n_sentences", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "sentence_chunks"

  def compute(s: UTF8String, maxTokens: Int): GenericArrayData = {
    require(maxTokens >= 1, s"sentence_chunks maxTokens must be >= 1, got $maxTokens")
    val str = s.toString
    val spans = SentenceSplit.spans(str)
    val rows = new scala.collection.mutable.ArrayBuffer[InternalRow]()
    var chunkStart = 0 // char offset of the current chunk in str
    var chunkEnd = 0
    var nSent = 0
    var nTok = 0
    def flush(): Unit = if (nSent > 0) {
      rows += InternalRow(
        UTF8String.fromString(str.substring(chunkStart, chunkEnd)),
        nSent, nTok)
      chunkStart = chunkEnd
      nSent = 0
      nTok = 0
    }
    var i = 0
    while (i < spans.length) {
      val t = SentenceSplit.tokenCount(spans(i))
      if (nSent > 0 && nTok + t > maxTokens) flush()
      chunkEnd += spans(i).length
      nSent += 1
      nTok += t
      i += 1
    }
    flush()
    new GenericArrayData(rows.toArray[Any])
  }

  override protected def nullSafeEval(text: Any, max: Any): Any =
    compute(text.asInstanceOf[UTF8String], max.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sentenceChunks", this, classOf[SentenceChunks].getName)
    defineCodeGen(ctx, ev, (t, m) => s"$self.compute($t, $m)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SentenceChunks =
    copy(left = newLeft, right = newRight)
}
