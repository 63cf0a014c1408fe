package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared primitives of the n-gram overlap kernels
  * ([[NgramOverlapStats]] single-reference, [[NgramOverlapStatsMulti]]
  * max-clipped multi-reference) — extracted rather than pasted twice
  * (the Dedup dense-path lesson).
  */
private[expressions] object NgramKernel {

  /** Collect the non-null tokens once as Strings. */
  def tokensOf(arr: ArrayData): Array[String] = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[String](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) out.add(arr.getUTF8String(i).toString)
      i += 1
    }
    out.toArray(new Array[String](out.size()))
  }

  /** Unambiguous gram key for the STRING fallback path: each token
    * length-prefixed (`len ':' tok`), a prefix-free encoding, so key
    * equality is token-SEQUENCE equality even when tokens contain any
    * would-be separator character (the upstream tokenizer splits only
    * on ' ', so e.g. U+0001 CAN occur inside a token; a fixed join
    * character would make same-order grams like ("a","b<SEP>c") and
    * ("a<SEP>b","c") collide).
    */
  def gramAt(toks: Array[String], start: Int, n: Int): String = {
    if (n == 1) return toks(start)
    val sb = new java.lang.StringBuilder()
    var j = 0
    while (j < n) {
      val t = toks(start + j)
      sb.append(t.length).append(':').append(t)
      j += 1
    }
    sb.toString
  }

  /** Open-addressed long→count map (linear probing, keys are packed
    * gram codes ≥ 0, sentinel −1): the clipping inner loop runs
    * millions of times per row batch and a boxed java.util.HashMap of
    * gram STRINGS was the hot path (measured on q205's char 6-grams).
    */
  final class LongCounts(expected: Int) {
    // capacity arithmetic in Long: `expected * 4` overflows Int past
    // ~536M entries (a degenerate giant per-row gram array), which
    // would round the capacity to 0 and crash slot() on an empty
    // table. Clamp to the largest power-of-two long-array the JVM can
    // hold; past the clamp the table degrades to a higher load factor
    // instead of failing (memory for the gram array itself gives out
    // long before the probe chain does).
    private val cap = {
      val want = java.lang.Long.highestOneBit(
        math.max(8L, expected.toLong) * 4L - 1L) << 1
      math.min(want, 1L << 30).toInt
    }
    private val mask = cap - 1
    private val ks = {
      val a = new Array[Long](cap); java.util.Arrays.fill(a, -1L); a
    }
    private val vs = new Array[Long](cap)
    @inline private def slot(k: Long): Int = {
      var i = ((k ^ (k >>> 32)) * 0x9E3779B97F4A7C15L >>> 40).toInt & mask
      while (ks(i) != -1L && ks(i) != k) i = (i + 1) & mask
      i
    }
    def inc(k: Long): Unit = {
      val i = slot(k)
      if (ks(i) == -1L) { ks(i) = k; vs(i) = 1L } else vs(i) += 1L
    }
    /** true (and decrements) iff the key still has budget — the clip. */
    def dec(k: Long): Boolean = {
      val i = slot(k)
      if (ks(i) == k && vs(i) > 0L) { vs(i) -= 1L; true } else false
    }
    /** this(k) = max(this(k), v) — the multi-reference count merge. */
    def setMax(k: Long, v: Long): Unit = {
      val i = slot(k)
      if (ks(i) == -1L) { ks(i) = k; vs(i) = v }
      else if (v > vs(i)) vs(i) = v
    }
    /** Visit every (key, count) entry. */
    def foreach(f: (Long, Long) => Unit): Unit = {
      var i = 0
      while (i < cap) {
        if (ks(i) != -1L) f(ks(i), vs(i))
        i += 1
      }
    }
  }

  @inline def packAt(ids: Array[Int], start: Int, n: Int, bits: Int): Long = {
    var k = 0L
    var j = 0
    while (j < n) { k = (k << bits) | ids(start + j); j += 1 }
    k
  }
}

/** Native one-pass clipped n-gram overlap statistics between a
  * candidate and a reference token array, for every order n = 1..maxN
  * at once: `array<struct<n int, clipped bigint, cand_total bigint,
  * ref_total bigint>>` (element i holds order i+1).
  *
  * `clipped` is the BLEU/ROUGE "modified" match count (Papineni et al.
  * ACL '02 §2.1): for each distinct candidate n-gram g,
  * `min(count_cand(g), count_ref(g))` — a candidate cannot earn more
  * credit for g than the reference contains. `cand_total`/`ref_total`
  * are the plain n-gram counts `max(0, len - n + 1)`, the denominators
  * of BLEU precision and ROUGE recall respectively.
  *
  * Both token arrays live in the SAME row, so the kernel is map-side
  * and shuffle-free — the alternative (explode both sides to
  * (pair, n, gram) rows and hash-join per gram) shuffles
  * O(maxN · corpus tokens) rows to compute a per-row scalar. At 100 TB
  * the explode-join shape is a full-corpus shuffle per metric; this is
  * a JIT'd linear scan per pair. O(maxN · (Lc + Lr)) time, one small
  * hash map per order.
  *
  * Null elements inside either array are skipped (split() output never
  * contains them). Null arrays → null (TernaryExpression contract).
  * `maxN` must be a foldable positive int.
  */
case class NgramOverlapStats(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  import NgramKernel._

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _), IntegerType)
          if third.foldable =>
        val n = third.eval()
        if (n == null || n.asInstanceOf[Int] < 1)
          TypeCheckResult.TypeCheckFailure("ngram_overlap_stats maxN must be a positive int literal")
        else TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"ngram_overlap_stats expects (array<string>, array<string>, foldable int), got ($a, $b, $c)")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("clipped", LongType, nullable = false),
    StructField("cand_total", LongType, nullable = false),
    StructField("ref_total", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "ngram_overlap_stats"

  @transient private lazy val maxN: Int = third.eval().asInstanceOf[Int]

  /** Shared by interpreted eval and codegen (the JaroWinkler /
    * TextArrayStats reference-object pattern — the hash-map loop gains
    * nothing from being inlined as Java source).
    */
  def compute(candArr: ArrayData, refArr: ArrayData): ArrayData = {
    val cand = tokensOf(candArr)
    val ref = tokensOf(refArr)
    // intern tokens to dense ids: a gram of n ids packs into one
    // NON-NEGATIVE long whenever n·bits ≤ 63, and the counting loops
    // run over primitive longs (no string building, no boxing). The
    // per-row vocabulary is tiny for char grams (chrF) and small for
    // word grams, so the packed path covers practically every row; the
    // length-prefixed string path remains for n·bits > 63.
    val dict = new java.util.HashMap[String, Integer](
      (cand.length + ref.length) * 2)
    def internAll(toks: Array[String]): Array[Int] = {
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
    val candIds = internAll(cand)
    val refIds = internAll(ref)
    val vocab = dict.size
    val bits = if (vocab <= 1) 1 else 64 - java.lang.Long.numberOfLeadingZeros((vocab - 1).toLong)
    val rows = new Array[Any](maxN)
    var n = 1
    while (n <= maxN) {
      val candTotal = math.max(0, cand.length - n + 1)
      val refTotal = math.max(0, ref.length - n + 1)
      var clipped = 0L
      if (candTotal > 0 && refTotal > 0) {
        if (n.toLong * bits <= 63L) {
          val counts = new LongCounts(refTotal)
          var i = 0
          while (i < refTotal) { counts.inc(packAt(refIds, i, n, bits)); i += 1 }
          i = 0
          while (i < candTotal) {
            if (counts.dec(packAt(candIds, i, n, bits))) clipped += 1L
            i += 1
          }
        } else {
          val refCounts = new java.util.HashMap[String, java.lang.Long](refTotal * 2)
          var i = 0
          while (i < refTotal) {
            val g = gramAt(ref, i, n)
            val prev = refCounts.get(g)
            refCounts.put(g, if (prev == null) 1L else prev + 1L)
            i += 1
          }
          i = 0
          while (i < candTotal) {
            val g = gramAt(cand, i, n)
            val left = refCounts.get(g)
            if (left != null && left > 0L) {
              clipped += 1L
              refCounts.put(g, left - 1L)
            }
            i += 1
          }
        }
      }
      rows(n - 1) = new GenericInternalRow(
        Array[Any](n, clipped, candTotal.toLong, refTotal.toLong))
      n += 1
    }
    new GenericArrayData(rows)
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("ngramOverlap", this, classOf[NgramOverlapStats].getName)
    nullSafeCodeGen(ctx, ev, (a, b, _) => s"${ev.value} = $self.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): NgramOverlapStats =
    copy(first = newFirst, second = newSecond, third = newThird)
}
