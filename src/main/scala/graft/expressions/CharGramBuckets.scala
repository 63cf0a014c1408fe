package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused character-gram → hashed-feature-bucket kernel for
  * [[graft.operators.LangNb]]: from a string, the `array<int>` of
  * feature-bucket ids of every `n`-CHARACTER window, where a gram's
  * bucket is its md5 digest's FIRST FOUR BYTES read as an unsigned
  * big-endian int, mod `buckets` — i.e. exactly
  *
  * {{{ CAST(('0x' || substring(md5(gram), 1, 8)) AS BIGINT) % buckets }}}
  *
  * in DuckDB / `pmod(conv(substring(md5(gram),1,8),16,10), buckets)`
  * in Spark SQL, which is what makes a hashed-n-gram model
  * oracle-replayable (the [[CharGramHashes]] portability convention:
  * md5 exists in every engine; the first 8 hex chars ARE the first 4
  * digest bytes). One pass per document, one reused MessageDigest,
  * windows resolved from a precomputed code-point offset table — the
  * declarative transform+md5 form evaluates its lambda interpreted and
  * builds a MessageDigest per gram (the profiled q147 cost).
  *
  * Contract: fewer than `n` characters → empty array; `n` and
  * `buckets` must be foldable positive ints.
  */
case class CharGramBuckets(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType)
          if second.foldable && third.foldable =>
        val n = second.eval()
        val b = third.eval()
        if (n == null || n.asInstanceOf[Int] <= 0 ||
            b == null || b.asInstanceOf[Int] <= 0)
          TypeCheckResult.TypeCheckFailure(
            "char_gram_buckets n and buckets must be positive int literals")
        else TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"char_gram_buckets expects (string, foldable int, foldable int), got ($a, $b, $c)")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "char_gram_buckets"

  @transient private lazy val n: Int = second.eval().asInstanceOf[Int]
  @transient private lazy val buckets: Int = third.eval().asInstanceOf[Int]

  /** Shared by interpreted eval and codegen (the [[CharGramHashes]]
    * pattern).
    */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
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
      val d = md.digest()
      // first 4 digest bytes, big-endian unsigned == first 8 md5 hex chars
      val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      out(p) = (u % buckets).toInt
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("charGramBuckets", this, classOf[CharGramBuckets].getName)
    nullSafeCodeGen(ctx, ev, (a, _, _) => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): CharGramBuckets =
    copy(first = newFirst, second = newSecond, third = newThird)
}
