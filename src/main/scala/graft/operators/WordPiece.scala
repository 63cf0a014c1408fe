package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WordPiece tokenization (Schuster & Nakajima 2012; the BERT tokenizer,
  * Devlin et al. 2019) — the third industry-standard subword family next
  * to BPE ([[Bpe.train]]) and the unigram LM ([[UnigramLm]]): merges are
  * learned like BPE's but ranked by the LIKELIHOOD score
  * `count(ab) / (count(a)·count(b))` instead of raw pair frequency
  * (the Hugging Face trainer convention), and encoding is NOT merge
  * replay but greedy longest-match-first against the final vocabulary,
  * with `##` marking word-internal continuation pieces.
  *
  * Scale split (the [[Bpe]] pattern): word frequencies are one
  * distributed explode + aggregate; merge learning runs on the bounded
  * top-`maxVocab` word-frequency table on the driver. The base alphabet
  * is collected from the FULL corpus (a distinct-character aggregate,
  * bounded by the script repertoire, not the corpus), so greedy
  * matching can always fall back to single characters and the training
  * corpus itself encodes with ZERO `[UNK]` — the losslessness q262
  * hash-gates. Encoding broadcasts the vocabulary (KBs) and runs
  * map-side with a per-partition word memo; the corpus never shuffles.
  *
  * Determinism: score ties break on the lexicographically smallest
  * (left, right) pair; scores compare as exact cross-multiplied
  * integers (BigInt — no floating-point ranking).
  */
object WordPiece {

  val Unk = "[UNK]"
  val Cont = "##"

  /** Final vocabulary + the ordered merge list that produced it
    * (merges kept for inspection/testing; encoding uses only `vocab`).
    */
  final case class WpModel(vocab: Set[String], merges: Seq[(String, String)])

  private def symbolize(w: String): Array[String] =
    w.toCharArray.zipWithIndex.map { case (c, i) =>
      if (i == 0) c.toString else Cont + c
    }

  /** Strip the continuation marker when gluing a merged pair. */
  private def glue(a: String, b: String): String = a + b.stripPrefix(Cont)

  /** Distributed word-frequency + alphabet aggregates, then the
    * driver-side likelihood-scored merge loop over the bounded
    * vocabulary. `numMerges` new pieces are added on top of the base
    * character alphabet (so |vocab| = |alphabet| + numMerges at most).
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxVocab: Int = 50000): WpModel = {
    require(numMerges >= 0 && maxVocab > 0, s"bad numMerges=$numMerges maxVocab=$maxVocab")
    val spark = df.sparkSession
    import spark.implicits._
    val words = df
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
    // Full-corpus alphabet: every char of every word, as initial and
    // continuation forms — the zero-UNK floor for greedy matching.
    val alphabet: Array[String] = words
      .select(explode(split(col("w"), "")).as("c"))
      .distinct().as[String].collect()
      .flatMap(c => Seq(c, Cont + c))
    val vocab: Array[(String, Long)] = words
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxVocab)
      .as[(String, Long)].collect()
    trainOnVocab(vocab, alphabet, numMerges)
  }

  /** The likelihood-scored merge loop, public for fixture-level
    * testing: at each step the pair maximizing
    * `count(pair) / (count(left)·count(right))` across the
    * freq-weighted vocabulary merges (exact BigInt cross-multiply
    * comparison; ties → lexicographically smallest pair), and the glued
    * piece joins the vocabulary.
    */
  private[operators] def trainOnVocab(vocab: Array[(String, Long)],
                                      alphabet: Array[String],
                                      numMerges: Int): WpModel = {
    var words: Array[(Array[String], Long)] =
      vocab.map { case (w, n) => (symbolize(w), n) }
    val pieces = scala.collection.mutable.LinkedHashSet[String](alphabet: _*)
    val merges = Vector.newBuilder[(String, String)]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      val pairCounts = new java.util.HashMap[(String, String), Long]()
      val symCounts = new java.util.HashMap[String, Long]()
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length) {
          symCounts.merge(syms(i), n, (a, b) => a + b)
          if (i < syms.length - 1)
            pairCounts.merge((syms(i), syms(i + 1)), n, (a, b) => a + b)
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // score(p) = nPair / (nLeft * nRight); compare p vs q exactly via
        // nPair(p)*nLeft(q)*nRight(q)  <>  nPair(q)*nLeft(p)*nRight(p)
        var best: (String, String) = null
        var bestNum = BigInt(-1); var bestDen = BigInt(1)
        val it = pairCounts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val p = e.getKey
          val num = BigInt(e.getValue)
          val den = BigInt(symCounts.get(p._1)) * BigInt(symCounts.get(p._2))
          val cmp = (num * bestDen).compare(bestNum * den)
          if (cmp > 0 || (cmp == 0 &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
            best = p; bestNum = num; bestDen = den
          }
        }
        merges += best
        pieces += glue(best._1, best._2)
        words = words.map { case (syms, n) => (applyMerge(syms, best), n) }
        step += 1
      }
    }
    WpModel(pieces.toSet, merges.result())
  }

  private def applyMerge(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += glue(syms(i), syms(i + 1))
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Greedy longest-match-first tokenization of one word (the published
    * WordPiece algorithm): from each position take the LONGEST vocab
    * piece (continuation form past position 0); if no piece matches —
    * or the word exceeds `maxChars` (the BERT 100-char guard) — the
    * whole word becomes `[UNK]`.
    */
  private[operators] def encodeWord(word: String, vocab: Set[String],
                                    maxChars: Int): Array[String] = {
    if (word.length > maxChars) return Array(Unk)
    val out = Array.newBuilder[String]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var piece: String = null
      while (end > start && piece == null) {
        val cand0 = word.substring(start, end)
        val cand = if (start == 0) cand0 else Cont + cand0
        if (vocab.contains(cand)) piece = cand else end -= 1
      }
      if (piece == null) return Array(Unk)
      out += piece
      start = end
    }
    out.result()
  }

  /** One tokenized document. */
  final case class WpTokens(id: Long, tokens: Array[String])

  /** Map-side corpus tokenization: vocabulary broadcast with the
    * closure, one memoized greedy encode per DISTINCT word per
    * partition ([[Bpe.encode]]'s shape).
    */
  def encode(df: DataFrame, idCol: String, textCol: String, model: WpModel,
             maxChars: Int = 100): Dataset[WpTokens] = {
    val spark = df.sparkSession
    import spark.implicits._
    val vocab = model.vocab
    df.select(col(idCol).cast("long"), lower(trim(col(textCol))))
      .as[(Long, String)]
      .mapPartitions { it =>
        val cache = new java.util.HashMap[String, Array[String]]()
        it.map { case (id, text) =>
          val tokens = text.split("\\s+").iterator.filter(_.nonEmpty).flatMap { w =>
            var t = cache.get(w)
            if (t == null) { t = encodeWord(w, vocab, maxChars); cache.put(w, t) }
            t
          }.toArray
          WpTokens(id, tokens)
        }
      }
  }

  /** Detokenize: continuation pieces glue to the previous piece, pieces
    * otherwise separate with a space — `decode(encode(w)) == w` for
    * every UNK-free word sequence.
    */
  def decode(tokens: Seq[String]): String = {
    val sb = new java.lang.StringBuilder()
    tokens.foreach { t =>
      if (t.startsWith(Cont)) sb.append(t.substring(Cont.length))
      else {
        if (sb.length() > 0) sb.append(' ')
        sb.append(t)
      }
    }
    sb.toString
  }
}
