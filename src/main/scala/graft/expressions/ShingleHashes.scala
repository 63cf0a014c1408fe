package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.Platform

/** Fused shingle→hash→distinct→sort kernel: from an `array<string>`
  * token column, the SORTED DISTINCT `array<bigint>` of `xxhash64` values
  * of all word n-grams (tokens joined by a single space). This is the
  * preprocessing step of every MinHash/Jaccard miner in
  * [[graft.operators.Dedup]], previously four chained declarative ops
  *
  * {{{ array_sort(transform(array_distinct(transform(sequence(...),
  *     i => array_join(slice(toks, i+1, n), " "))), s => xxhash64(s))) }}}
  *
  * whose lambdas all evaluate INTERPRETED per element (profiled as the
  * dominant cost of q44 at sf0.1: 3.4 s of 5.2 s) — and whose n-gram
  * strings are materialized only to be hashed and thrown away. Here: one
  * JIT'd pass, no intermediate strings (token bytes are written into one
  * reused buffer per shingle and hashed in place).
  *
  * Hash-compatible with Spark's `xxhash64(string)` by construction:
  * `XXH64.hashUnsafeBytes(bytes, 42L)` over the UTF-8 bytes of the
  * joined shingle — same bytes, same public hash kernel, same seed.
  * Distinctness moves from strings to hashed longs: identical except for
  * 64-bit xxhash collisions between distinct shingles (~1e-16 per pair —
  * the same equivalence the miners already accept when verifying on
  * hashed token sets).
  *
  * Contract (mirrors [[graft.operators.Dedup.shingles]]): fewer than `n`
  * tokens → empty array; `n = 1` hashes the tokens themselves (= the
  * tokenSet path). Null token elements never occur in split() output and
  * are skipped. `n` must be a foldable positive int.
  */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        val n = right.eval()
        if (n == null || n.asInstanceOf[Int] <= 0)
          TypeCheckResult.TypeCheckFailure("shingle_hashes n must be a positive int literal")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes expects (array<string>, foldable int), got ($l, $r)")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_hashes"

  @transient private lazy val n: Int = right.eval().asInstanceOf[Int]

  /** Shared by interpreted eval and codegen — the loop body is identical
    * either way (same pattern as [[TextArrayStats]]).
    */
  def compute(toks: ArrayData): ArrayData = {
    val nt = toks.numElements()
    if (nt < n) return new GenericArrayData(Array.emptyLongArray)
    val nShingles = nt - n + 1
    val hashes = new Array[Long](nShingles)
    if (n == 1) {
      var i = 0
      while (i < nShingles) {
        val w = toks.getUTF8String(i)
        hashes(i) =
          if (w == null) 42L // placeholder; split() never yields nulls
          else XXH64.hashUnsafeBytes(w.getBaseObject, w.getBaseOffset, w.numBytes(), 42L)
        i += 1
      }
    } else {
      var buf = new Array[Byte](64)
      var i = 0
      while (i < nShingles) {
        var len = 0
        var j = 0
        while (j < n) {
          val w = toks.getUTF8String(i + j)
          val wb = if (w == null) 0 else w.numBytes()
          val need = len + wb + 1
          if (need > buf.length) {
            val grown = new Array[Byte](math.max(need, buf.length * 2))
            System.arraycopy(buf, 0, grown, 0, len)
            buf = grown
          }
          if (j > 0) { buf(len) = ' '.toByte; len += 1 }
          if (w != null) { w.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + len); len += wb }
          j += 1
        }
        hashes(i) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 42L)
        i += 1
      }
    }
    java.util.Arrays.sort(hashes)
    // in-place dedup of the sorted run
    var out = 0
    var i = 1
    while (i < nShingles) {
      if (hashes(i) != hashes(out)) { out += 1; hashes(out) = hashes(i) }
      i += 1
    }
    val m = out + 1
    new GenericArrayData(if (m == nShingles) hashes else java.util.Arrays.copyOf(hashes, m))
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingleHashes", this, classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, (a, _) => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashes =
    copy(left = newLeft, right = newRight)
}
