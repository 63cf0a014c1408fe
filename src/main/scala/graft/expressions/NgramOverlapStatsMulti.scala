package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Multi-reference clipped n-gram overlap — the form real evaluation
  * sets need (1..k references per candidate; Papineni et al. ACL '02
  * §2.1 clips against the MAX count of a gram over all references):
  * `(cand array<string>, refs array<array<string>>, maxN)` →
  * `array<struct<n int, clipped bigint, cand_total bigint,
  * ref_total bigint>>`.
  *
  * Per order n and distinct candidate gram g the credit is
  * `min(count_cand(g), max_r count_r(g))`. This canNOT be derived
  * from k single-reference kernel results: the max is per-GRAM inside
  * the sum (Σ_g min(c_g, max_r r_g) ≥ max_r Σ_g min(c_g, r_g), strictly
  * on mixed-coverage refs — spec-pinned), so the kernel merges the
  * per-reference count tables with [[NgramKernel.LongCounts.setMax]]
  * before the standard clipping pass.
  *
  * `ref_total` is the gram total of the EFFECTIVE reference — the one
  * whose unigram length is closest to the candidate's, ties to the
  * shorter (Papineni's "best match length" brevity-penalty convention;
  * also sacreBLEU's default) — so BLEU code reads BP from element 1
  * exactly as in the single-reference form. No references (empty array
  * or all-null elements) degrades to zero counts, not null. Same
  * map-side shape as [[NgramOverlapStats]]: both sides of the pair
  * live in one row, no shuffle, O(maxN · (Lc + Σ Lr)) per row.
  */
case class NgramOverlapStatsMulti(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  import NgramKernel._

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(ArrayType(StringType, _), _), IntegerType)
          if third.foldable =>
        val n = third.eval()
        if (n == null || n.asInstanceOf[Int] < 1)
          TypeCheckResult.TypeCheckFailure("ngram_overlap_stats_multi maxN must be a positive int literal")
        else TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"ngram_overlap_stats_multi expects (array<string>, array<array<string>>, foldable int), got ($a, $b, $c)")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("clipped", LongType, nullable = false),
    StructField("cand_total", LongType, nullable = false),
    StructField("ref_total", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "ngram_overlap_stats_multi"

  @transient private lazy val maxN: Int = third.eval().asInstanceOf[Int]

  def compute(candArr: ArrayData, refsArr: ArrayData): ArrayData = {
    val cand = tokensOf(candArr)
    val refs = {
      val k = refsArr.numElements()
      val out = new java.util.ArrayList[Array[String]](k)
      var i = 0
      while (i < k) {
        if (!refsArr.isNullAt(i)) out.add(tokensOf(refsArr.getArray(i)))
        i += 1
      }
      out
    }
    val nRefs = refs.size()
    // intern across candidate + ALL references so packed gram codes
    // are comparable between any reference's table and the candidate
    var totalRefLen = 0
    val dict = new java.util.HashMap[String, Integer](cand.length * 2 + 16)
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
    val refIds = new Array[Array[Int]](nRefs)
    var r = 0
    while (r < nRefs) {
      refIds(r) = internAll(refs.get(r))
      totalRefLen += refs.get(r).length
      r += 1
    }
    val vocab = dict.size
    val bits = if (vocab <= 1) 1 else 64 - java.lang.Long.numberOfLeadingZeros((vocab - 1).toLong)
    // effective reference length: closest to the candidate's, ties to
    // the shorter; no references → 0
    val cLen = cand.length
    var effLen = 0
    var bestDiff = Int.MaxValue
    r = 0
    while (r < nRefs) {
      val len = refs.get(r).length
      val d = math.abs(len - cLen)
      if (d < bestDiff || (d == bestDiff && len < effLen)) { effLen = len; bestDiff = d }
      r += 1
    }
    val rows = new Array[Any](maxN)
    var n = 1
    while (n <= maxN) {
      val candTotal = math.max(0, cLen - n + 1)
      val refTotalEff = math.max(0, effLen - n + 1)
      var clipped = 0L
      if (candTotal > 0 && nRefs > 0) {
        if (n.toLong * bits <= 63L) {
          // per-reference counts max-merged into one budget table
          val best = new LongCounts(math.max(8, totalRefLen))
          r = 0
          while (r < nRefs) {
            val ids = refIds(r)
            val t = math.max(0, ids.length - n + 1)
            if (t > 0) {
              val cur = new LongCounts(t)
              var i = 0
              while (i < t) { cur.inc(packAt(ids, i, n, bits)); i += 1 }
              cur.foreach((k, v) => best.setMax(k, v))
            }
            r += 1
          }
          var i = 0
          while (i < candTotal) {
            if (best.dec(packAt(candIds, i, n, bits))) clipped += 1L
            i += 1
          }
        } else {
          val best = new java.util.HashMap[String, java.lang.Long](totalRefLen * 2)
          r = 0
          while (r < nRefs) {
            val toks = refs.get(r)
            val t = math.max(0, toks.length - n + 1)
            val cur = new java.util.HashMap[String, java.lang.Long](t * 2)
            var i = 0
            while (i < t) {
              val g = gramAt(toks, i, n)
              val prev = cur.get(g)
              cur.put(g, if (prev == null) 1L else prev + 1L)
              i += 1
            }
            cur.forEach((g, v) => {
              val prev = best.get(g)
              if (prev == null || v > prev) best.put(g, v)
            })
            r += 1
          }
          var i = 0
          while (i < candTotal) {
            val g = gramAt(cand, i, n)
            val left = best.get(g)
            if (left != null && left > 0L) {
              clipped += 1L
              best.put(g, left - 1L)
            }
            i += 1
          }
        }
      }
      rows(n - 1) = new GenericInternalRow(
        Array[Any](n, clipped, candTotal.toLong, refTotalEff.toLong))
      n += 1
    }
    new GenericArrayData(rows)
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("ngramOverlapMulti", this, classOf[NgramOverlapStatsMulti].getName)
    nullSafeCodeGen(ctx, ev, (a, b, _) => s"${ev.value} = $self.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): NgramOverlapStatsMulti =
    copy(first = newFirst, second = newSecond, third = newThird)
}
