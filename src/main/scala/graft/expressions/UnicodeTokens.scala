package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode-aware word segmentation of a string column —
  * `array<string>` of lowercased tokens. Whitespace splitting (the
  * engine's default tokenizer) is silently meaningless on scripts that
  * don't delimit words with spaces — Chinese, Japanese, Thai — which
  * are a large share of any real multilingual crawl; this expression is
  * the tokenizer-seam alternative ([[graft.functions.Tokenize]]) for
  * token stats, n-gram dedup, and generation-eval metrics on such text.
  *
  * Segmentation, all JDK-only (offline-safe, no new dependency):
  *
  *  1. UAX#29 word boundaries from `java.text.BreakIterator`'s word
  *     instance for the THAI locale. The JDK's word rules are
  *     locale-invariant UAX#29 for every space-delimited script; the
  *     Thai locale additionally loads the JDK's one bundled
  *     dictionary-based segmenter, giving real Thai word breaks
  *     instead of one run per phrase. Latin/Cyrillic/Greek/Hangul
  *     segment identically under ROOT and th — spec-asserted
  *     (UnicodeTokensSpec), so the dictionary is a strict upgrade.
  *  2. Per-character refinement of ideographic runs: HAN and HIRAGANA
  *     codepoints become one token each — the convention of both
  *     Lucene's StandardTokenizer and sacreBLEU's `zh` tokenizer
  *     (UAX#29 alone leaves an unsegmented Han run per clause, making
  *     token-level metrics degenerate). Katakana and Hangul runs stay
  *     whole: they are phonetic word units, and UAX#29 already bounds
  *     them.
  *  3. Tokens with no letter or digit codepoint (pure punctuation /
  *     symbol segments) are dropped; survivors are lowercased with
  *     `Locale.ROOT` — same normalization as the whitespace tokenizer.
  *
  * On single-space-separated ASCII text (the oracle corpus) the output
  * is IDENTICAL to the whitespace tokenizer — q209 pins that
  * degradation in DuckDB, and the md5 of the joined tokens round-trips
  * the full segmentation through the oracle compare.
  *
  * Scale shape: map-side, one pass per row, no shuffle; the
  * BreakIterator (not thread-safe, nontrivial to construct) is reused
  * via a ThreadLocal.
  */
case class UnicodeTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"unicode_tokens expects string, got $t")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "unicode_tokens"

  def compute(s: UTF8String): GenericArrayData =
    new GenericArrayData(UnicodeTokens.segment(s.toString))

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("unicodeTokens", this, classOf[UnicodeTokens].getName)
    defineCodeGen(ctx, ev, c => s"$self.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeTokens =
    copy(child = newChild)
}

object UnicodeTokens {

  private val iter = new ThreadLocal[java.text.BreakIterator] {
    override def initialValue(): java.text.BreakIterator =
      java.text.BreakIterator.getWordInstance(java.util.Locale.forLanguageTag("th"))
  }

  /** Scripts refined to one token per codepoint (see class doc). */
  private def perChar(cp: Int): Boolean = {
    val sc = Character.UnicodeScript.of(cp)
    sc == Character.UnicodeScript.HAN || sc == Character.UnicodeScript.HIRAGANA
  }

  /** Word tokens of `s` per the class-doc algorithm (exposed for the
    * spec's fixture table and any JVM-side caller).
    */
  def segment(s: String): Array[UTF8String] = {
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    if (s.isEmpty) return out.toArray
    val bi = iter.get()
    bi.setText(s)
    var start = bi.first()
    var end = bi.next()
    while (end != java.text.BreakIterator.DONE) {
      emit(s, start, end, out)
      start = end
      end = bi.next()
    }
    out.toArray
  }

  private def lowerTok(s: String, a: Int, b: Int,
                       out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    var i = a
    var hasWord = false
    while (i < b && !hasWord) {
      val cp = s.codePointAt(i)
      if (Character.isLetterOrDigit(cp)) hasWord = true
      i += Character.charCount(cp)
    }
    if (hasWord)
      out += UTF8String.fromString(
        s.substring(a, b).toLowerCase(java.util.Locale.ROOT))
  }

  private def emit(s: String, start: Int, end: Int,
                   out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    // fast path: no per-char script in the segment → one token
    var i = start
    var hasPerChar = false
    while (i < end && !hasPerChar) {
      val cp = s.codePointAt(i)
      if (perChar(cp)) hasPerChar = true
      i += Character.charCount(cp)
    }
    if (!hasPerChar) { lowerTok(s, start, end, out); return }
    // refinement: per-char scripts emit one token per codepoint; runs
    // of everything else flush as one (letter-or-digit-filtered) token
    var runStart = -1
    i = start
    while (i < end) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      if (perChar(cp)) {
        if (runStart >= 0) { lowerTok(s, runStart, i, out); runStart = -1 }
        out += UTF8String.fromString(s.substring(i, i + n))
      } else {
        if (runStart < 0) runStart = i
      }
      i += n
    }
    if (runStart >= 0) lowerTok(s, runStart, end, out)
  }
}
