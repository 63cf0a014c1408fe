package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenization (Sennrich, Haddow & Birch, "Neural
  * machine translation of rare words with subword units", ACL 2016) —
  * the real subword tokenizer behind LLM token accounting, replacing
  * regex approximations: merges are LEARNED from corpus statistics and
  * applied deterministically.
  *
  * Scale split: the corpus-sized work (word frequency counting) is a
  * distributed explode + aggregate; training then runs on the BOUNDED
  * word-frequency vocabulary (capped at `maxVocab` most-frequent
  * words) on the driver — the same vocab-bounded-model pattern as
  * [[Scoring.bigramCrossEntropy]]'s LM tables. Encoding broadcasts the
  * merge ranks (numMerges strings — KBs) and runs map-side with a
  * per-partition word cache; the corpus never shuffles.
  *
  * Conventions: words are whitespace-split and lowercased; a word's
  * symbol sequence is its characters plus a final `</w>` end-of-word
  * marker (kept in the output tokens — it is what distinguishes
  * "est" mid-word from "est" word-final). Ties in pair frequency break
  * lexicographically, so training is deterministic.
  */
object Bpe {

  val EndOfWord = "</w>"

  /** Ordered merge list; rank = position (lower merges first). */
  final case class BpeModel(merges: Seq[(String, String)]) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
  }

  /** Distributed word-frequency count, then driver-side merge learning
    * over the bounded vocabulary.
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxVocab: Int = 50000): BpeModel = {
    require(numMerges >= 0 && maxVocab > 0, s"bad numMerges=$numMerges maxVocab=$maxVocab")
    val spark = df.sparkSession
    import spark.implicits._
    val vocab: Array[(String, Long)] = df
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxVocab)
      .as[(String, Long)].collect()
    trainOnVocab(vocab, numMerges)
  }

  /** The merge-learning loop, public for fixture-level testing: at each
    * step, the most frequent adjacent symbol pair across the (freq-
    * weighted) vocabulary merges; ties break on the lexicographically
    * smallest pair.
    */
  private[operators] def trainOnVocab(vocab: Array[(String, Long)],
                                      numMerges: Int): BpeModel = {
    var words: Array[(Array[String], Long)] = vocab.map { case (w, n) =>
      ((w.map(_.toString) :+ EndOfWord).toArray, n)
    }
    val merges = Vector.newBuilder[(String, String)]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          counts.merge((syms(i), syms(i + 1)), n, (a, b) => a + b)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var best: (String, String) = null
        var bestN = -1L
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val p = e.getKey
          val n = e.getValue
          if (n > bestN || (n == bestN &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
            best = p; bestN = n
          }
        }
        merges += best
        words = words.map { case (syms, n) => (applyMerge(syms, best), n) }
        step += 1
      }
    }
    BpeModel(merges.result())
  }

  private def applyMerge(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Encode one word: repeatedly merge the lowest-rank adjacent pair
    * (the GPT-2 application order — equivalent to replaying the learned
    * merge sequence, cheaper than scanning all merges).
    */
  private[operators] def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms = (word.map(_.toString) :+ EndOfWord).toArray
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (bestPair == null) continue = false
      else syms = applyMerge(syms, bestPair)
      if (syms.length < 2) continue = false
    }
    syms
  }

  /** One tokenized document. */
  final case class BpeTokens(id: Long, tokens: Array[String])

  /** Map-side corpus tokenization: merge ranks broadcast with the
    * closure, one memoized encode per DISTINCT word per partition
    * (Zipf makes the cache hit rate the dominant term).
    */
  def encode(df: DataFrame, idCol: String, textCol: String, model: BpeModel): Dataset[BpeTokens] = {
    val spark = df.sparkSession
    import spark.implicits._
    val merges = model.merges
    df.select(col(idCol).cast("long"), lower(trim(col(textCol))))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ranks = BpeModel(merges).ranks
        val cache = new java.util.HashMap[String, Array[String]]()
        it.map { case (id, text) =>
          val tokens = text.split("\\s+").iterator.filter(_.nonEmpty).flatMap { w =>
            var t = cache.get(w)
            if (t == null) { t = encodeWord(w, ranks); cache.put(w, t) }
            t
          }.toArray
          BpeTokens(id, tokens)
        }
      }
  }
}
