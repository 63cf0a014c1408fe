package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Jaro–Winkler similarity (Jaro '89, Winkler '90 —
  * the U.S. Census Bureau record-linkage string comparator), the
  * transposition-aware rung of the fuzzy-match ladder next to
  * Levenshtein ([[graft.operators.FuzzyJoin]]) and the set-based
  * Jaccard miners: Jaro scores matched characters within a sliding
  * window and discounts out-of-order matches, so it is the natural
  * metric for typo/OCR transposition noise where edit distance
  * over-penalizes.
  *
  * Semantics are pinned to DuckDB's `jaro_winkler_similarity` so a
  * linkage run is cross-engine replayable (probed empirically against
  * DuckDB, see JaroWinklerSpec):
  *
  *  - operates on UTF-8 BYTES, not code points (`'résumé'` vs
  *    `'resume'` scores 0.7222 = the byte view, verified);
  *  - either side empty → 0.0;
  *  - match window = max(l1,l2)/2 - 1, clamped to ≥ 0 (so 1-byte
  *    equal strings score 1.0 but `'ab'` vs `'ba'` scores 0.0 —
  *    verified against DuckDB);
  *  - two-pass greedy matching, transpositions = positional
  *    mismatches between the matched sequences / 2 with INTEGER
  *    division (`'abcXXX'` vs `'bcaYYY'` = 0.5556, verified);
  *  - Winkler prefix boost `j + l·0.1·(1-j)` (common prefix capped
  *    at 4 bytes) applied only when `j > 0.7` (boundary probed: a
  *    constructed exact-0.7 jaro IS boosted because its computed
  *    double lands one ulp above the 0.7 literal — matching DuckDB's
  *    comparison, so the same doubles make the same decision).
  *
  * Null input → null (BinaryExpression null-safe contract). O(l1·w)
  * time, two small boolean scratch arrays — per-row cost is linear in
  * string bytes for the window sizes real keys have.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  /** Shared by interpreted eval and codegen (the [[CharGramHashes]]
    * pattern — the loop is too branchy to inline as Java source, and
    * a JIT'd method call costs nothing against the per-row work).
    */
  def compute(a: UTF8String, b: UTF8String): Double =
    JaroWinkler.score(a.getBytes, b.getBytes)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("jaroWinkler", this, classOf[JaroWinkler].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $self.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Jaro–Winkler over raw bytes; see class doc for the pinned
    * semantics. Double arithmetic in the canonical textbook order
    * `(m/l1 + m/l2 + (m-t)/m) / 3` — the same IEEE operations DuckDB
    * performs, so scores agree to the ulp on ASCII keys (asserted
    * corpus-wide by the q158 oracle, which replays the whole linkage
    * in DuckDB).
    */
  def score(s1: Array[Byte], s2: Array[Byte]): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var unmatched = true
      while (j <= hi && unmatched) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; unmatched = false
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // positional mismatches between the two matched sequences
    var mismatches = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) mismatches += 1
        k += 1
      }
      i += 1
    }
    val t = mismatches / 2 // integer half, pinned to DuckDB
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (m - t) / md) / 3.0
    if (jaro > 0.7) {
      val maxPrefix = math.min(4, math.min(l1, l2))
      var l = 0
      while (l < maxPrefix && s1(l) == s2(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }
}
