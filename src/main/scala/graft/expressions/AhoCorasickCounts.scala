package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Aho–Corasick multi-pattern counter: per-pattern occurrence
  * counts of a FIXED pattern list over a string column, one automaton
  * pass per row — the blocklist-filter kernel
  * ([[graft.operators.Blocklist]]). No reference counterpart
  * (SURVEY.md §7.4 LLM-pipeline category); the algorithm is the
  * classic Aho–Corasick (CACM '75).
  *
  * Counts EVERY occurrence of EVERY pattern — overlapping occurrences
  * and patterns nested inside other patterns included (the dictionary-
  * suffix chain is pre-flattened into each node's emit list at build
  * time, so the scan is a plain goto-walk with no fail-chasing on the
  * hot path). Matching is exact and case-sensitive; callers wanting
  * case folding lower BOTH sides (the operator does `lower(col)`).
  *
  * Why an Expression and not N `contains`/`regexp_count` columns: one
  * pass over the text regardless of pattern count (O(len + matches)
  * vs O(N·len)), and the automaton — built ONCE lazily per executor
  * from the foldable literal — rides the closure instead of a join.
  * At 100 TB the blocklist is thousands of terms; per-term column
  * scans are the quadratic trap this kernel exists to avoid.
  *
  * Output `array<long>` aligned to the pattern list's order. Null text
  * → null; empty text → all-zero counts.
  */
case class AhoCorasickCounts(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        val arr = right.eval()
        if (arr == null) TypeCheckResult.TypeCheckFailure(
          "aho_corasick_counts pattern list must not be null")
        else {
          val a = arr.asInstanceOf[ArrayData]
          val bad = (0 until a.numElements()).exists(i =>
            a.isNullAt(i) || a.getUTF8String(i).numChars() == 0)
          if (bad) TypeCheckResult.TypeCheckFailure(
            "aho_corasick_counts patterns must be non-null, non-empty strings")
          else if (a.numElements() == 0) TypeCheckResult.TypeCheckFailure(
            "aho_corasick_counts pattern list must be non-empty")
          else TypeCheckResult.TypeCheckSuccess
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"aho_corasick_counts expects (string, foldable array<string>), got ($l, $r)")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "aho_corasick_counts"

  /** Built once per (deserialized) expression instance — i.e. once per
    * executor per plan, from the foldable literal. Flat int arrays, no
    * per-state boxing beyond the child maps.
    */
  @transient private lazy val ac: AhoCorasickCounts.Automaton = {
    val a = right.eval().asInstanceOf[ArrayData]
    val pats = Array.tabulate(a.numElements())(i => a.getUTF8String(i).toString)
    AhoCorasickCounts.build(pats)
  }

  def compute(text: UTF8String): ArrayData = {
    val counts = new Array[Long](ac.nPatterns)
    val s = text.toString
    var state = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      var nxt = ac.child(state).get(c)
      while (nxt == null && state != 0) {
        state = ac.fail(state)
        nxt = ac.child(state).get(c)
      }
      state = if (nxt == null) 0 else nxt.intValue()
      val emit = ac.emit(state)
      var j = 0
      while (j < emit.length) { counts(emit(j)) += 1L; j += 1 }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def nullSafeEval(t: Any, p: Any): Any =
    compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("ahoCorasick", this, classOf[AhoCorasickCounts].getName)
    nullSafeCodeGen(ctx, ev, (t, _) => s"${ev.value} = $self.compute($t);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AhoCorasickCounts =
    copy(left = newLeft, right = newRight)
}

object AhoCorasickCounts {

  /** Goto trie + fail links + pre-flattened emit lists. `child` maps are
    * per-state `HashMap[Char, Int]` (alphabet-agnostic — the corpus is
    * multilingual, a dense 64K table per state would waste memory on a
    * large blocklist).
    */
  final class Automaton(
      val child: Array[java.util.HashMap[Character, Integer]],
      val fail: Array[Int],
      val emit: Array[Array[Int]],
      val nPatterns: Int)

  private[expressions] def build(patterns: Array[String]): Automaton = {
    val child = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    // trie
    var p = 0
    while (p < patterns.length) {
      val s = patterns(p)
      var state = 0
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        val nxt = child(state).get(c)
        if (nxt == null) {
          child += new java.util.HashMap[Character, Integer]()
          ends += Nil
          child(state).put(c, child.length - 1)
          state = child.length - 1
        } else state = nxt.intValue()
        i += 1
      }
      ends(state) = p :: ends(state)
      p += 1
    }
    // BFS fail links; emit(u) = own endings ++ emit(fail(u)) — flattened
    // here so the scan never walks the dictionary-suffix chain
    val n = child.length
    val fail = new Array[Int](n)
    val emit = new Array[Array[Int]](n)
    emit(0) = ends(0).reverse.toArray
    val queue = new java.util.ArrayDeque[Integer]()
    child(0).forEach { (_, v) =>
      fail(v) = 0
      emit(v) = ends(v).reverse.toArray ++ emit(0)
      queue.add(v)
    }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      child(u).forEach { (c, v) =>
        var f = fail(u)
        var nxt = child(f).get(c)
        while (nxt == null && f != 0) {
          f = fail(f)
          nxt = child(f).get(c)
        }
        fail(v) = if (nxt == null || nxt.intValue() == v) 0 else nxt.intValue()
        emit(v) = ends(v).reverse.toArray ++ emit(fail(v))
        queue.add(v)
      }
    }
    new Automaton(child.toArray, fail, emit, patterns.length)
  }
}
