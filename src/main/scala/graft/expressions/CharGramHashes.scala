package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused character-gram → md5 kernel for
  * [[graft.operators.Dedup.duplicateSpans]]: from a string, the
  * `array<binary>` of 16-byte md5 digests of every `n`-CHARACTER
  * window (array index i = the 1-based text position i + 1's gram...
  * i.e. element i hashes the window starting at character i,
  * 0-based). Replaces the declarative
  *
  * {{{ transform(sequence(1, length - n + 1),
  *     p => unhex(md5(substr(text, p, n)))) }}}
  *
  * whose lambda evaluates INTERPRETED per element AND whose `md5`
  * builds a fresh MessageDigest per gram (profiled as the dominant
  * q147 cost: ~4 µs/gram — allocation + cipher init, not hashing).
  * Here: one pass per document, one reused MessageDigest, character
  * windows resolved from a single precomputed code-point offset
  * table (no per-gram substring scan), gram bytes fed to the digest
  * in place.
  *
  * Byte-compatible with `unhex(md5(substr(text, p, n)))` by
  * construction: a code-point-aligned slice of valid UTF-8 IS the
  * UTF-8 encoding of the substring, and both Spark's `substr` and
  * DuckDB's `substr` index by code point — so the oracle's SQL `md5`
  * over the same substring produces the same 128-bit identity.
  *
  * Contract: fewer than `n` characters → empty array; `n` must be a
  * foldable positive int.
  */
case class CharGramHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        val n = right.eval()
        if (n == null || n.asInstanceOf[Int] <= 0)
          TypeCheckResult.TypeCheckFailure("char_gram_hashes n must be a positive int literal")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"char_gram_hashes expects (string, foldable int), got ($l, $r)")
    }

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)

  override def prettyName: String = "char_gram_hashes"

  @transient private lazy val n: Int = right.eval().asInstanceOf[Int]

  /** Shared by interpreted eval and codegen (the [[ShingleHashes]]
    * pattern).
    */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    // code-point start offsets, one linear scan (UTF-8 continuation
    // bytes are 10xxxxxx)
    var nChars = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) nChars += 1
      i += 1
    }
    if (nChars < n) return new GenericArrayData(Array.empty[Any])
    val offsets = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { offsets(c) = i; c += 1 }
      i += 1
    }
    offsets(nChars) = bytes.length
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](nChars - n + 1)
    var p = 0
    while (p <= nChars - n) {
      md.reset()
      md.update(bytes, offsets(p), offsets(p + n) - offsets(p))
      out(p) = md.digest()
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("charGramHashes", this, classOf[CharGramHashes].getName)
    nullSafeCodeGen(ctx, ev, (a, _) => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharGramHashes =
    copy(left = newLeft, right = newRight)
}
