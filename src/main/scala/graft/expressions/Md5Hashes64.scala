package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused token→md5→distinct→sort kernel: from an `array<string>` token
  * column, the SORTED DISTINCT `array<bigint>` of 64-bit md5-prefix
  * hashes (the first 8 digest bytes, big-endian — exactly the value
  * `parseUnsignedLong(substring(md5_hex, 1, 16), 16)` yields, so an
  * ANSI-SQL engine can recompute it from its own `md5()`; see the q25
  * oracle). The engine-portable sibling of [[ShingleHashes]] (n = 1):
  * xxhash64 is faster but Spark-only, which made the SimHash signature
  * unverifiable outside Spark.
  *
  * One JIT'd pass per row — the declarative
  * `array_distinct(transform(toks, t -> conv(substring(md5(t),...))))`
  * form evaluates its lambda interpreted per element (measured 2.6×
  * slower on q25 at sf0.1) and is kept in `DedupSpec` as the kernel's
  * executable specification.
  *
  * Null token elements never occur in split() output and hash as the
  * empty string if they do. MD5 instances are per-thread
  * ([[java.security.MessageDigest]] is stateful and not thread-safe;
  * expression objects are shared across codegen'd tasks).
  */
case class Md5Hashes64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_hashes64 expects array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "md5_hashes64"

  @transient private lazy val md5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Shared by interpreted eval and codegen (same pattern as
    * [[ShingleHashes.compute]]).
    */
  def compute(toks: ArrayData): ArrayData = {
    val nt = toks.numElements()
    if (nt == 0) return new GenericArrayData(Array.emptyLongArray)
    val md = md5.get()
    val hashes = new Array[Long](nt)
    var i = 0
    while (i < nt) {
      val w = toks.getUTF8String(i)
      md.reset()
      val d = md.digest(if (w == null) Array.emptyByteArray else w.getBytes)
      // first 8 digest bytes, big-endian == first 16 hex chars as u64
      hashes(i) = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      i += 1
    }
    java.util.Arrays.sort(hashes)
    // in-place dedup of the sorted run
    var out = 0
    i = 1
    while (i < nt) {
      if (hashes(i) != hashes(out)) { out += 1; hashes(out) = hashes(i) }
      i += 1
    }
    val m = out + 1
    new GenericArrayData(if (m == nt) hashes else java.util.Arrays.copyOf(hashes, m))
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("md5Hashes64", this, classOf[Md5Hashes64].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Hashes64 =
    copy(child = newChild)
}
