package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo, "Subword regularization", ACL
  * 2018 — the SentencePiece unigram model): pieces carry independent
  * probabilities, a word's segmentation likelihood is the product of
  * its pieces', training is EM over the segmentation lattice, and
  * tokenization is the Viterbi (max-probability) path. The OTHER
  * industry-standard subword model next to [[Bpe]]: modern pipelines
  * (T5/LLaMA-family SentencePiece vocabularies) report token counts
  * under it, so a corpus engine that budgets tokens needs both.
  *
  * Simplifications vs full SentencePiece, chosen for exactness: fixed
  * seed vocabulary (every ≤ `maxPieceLen`-char substring of the corpus
  * vocabulary, all single chars plus the `seedMulti` highest-scoring
  * multi-char pieces), FIXED iteration count, no prune rounds — the
  * judge of convergence is the spec's planted-morphology fixture, not
  * a loss heuristic.
  *
  * Scale split (the [[Bpe.train]] convention): the corpus-sized work
  * is ONE distributed word-frequency aggregate; EM then runs on the
  * driver over the BOUNDED (word, freq) vocabulary — O(vocab ×
  * wordLen × maxPieceLen) per iteration, freq-weighted, never touching
  * the corpus again. Tokenization is map-side: broadcast piece
  * log-probs, per-partition word memo cache, zero shuffles.
  *
  * Determinism, engineered so the FULL train-then-count pipeline is
  * SQL-replayable (the q248 integer-quantization convention):
  *   - seed scores are exact long occurrence sums; the multi-char cut
  *     ranks (score desc, piece asc);
  *   - the E-step's forward/backward sums fold k = 1..maxPieceLen in
  *     ascending order with a 0.0 seed — the exact parenthesization
  *     the oracle's recursive CTE writes out, so the doubles are
  *     bit-identical;
  *   - each occurrence's expected count quantizes to 10⁻⁹ units
  *     (HALF_UP, matching SQL `round`) and the M-step sums LONGS —
  *     order-independent — then renormalizes by exact long division;
  *   - Viterbi runs in integer micro-log space (llq = round(ln p·10⁶)):
  *     path scores are long sums, compared exactly, ties broken by
  *     fewer tokens then smallest piece-length, all replayable.
  */
object UnigramLm {

  /** Unknown single characters tokenize as themselves at this penalty
    * (micro-log units ≈ ln 10⁻¹³ — below any trained piece), so every
    * word has a Viterbi path even off-corpus.
    */
  val UnkLlq: Long = -30000000L

  final case class PieceStat(seedScore: Long, expq: Long, prob: Double)

  final case class UnigramModel(pieces: Map[String, PieceStat],
                                maxPieceLen: Int) {
    /** Integer micro-log probs for Viterbi (zero-prob pieces drop out). */
    @transient lazy val llq: Map[String, Long] = pieces.collect {
      case (p, st) if st.prob > 0.0 =>
        p -> BigDecimal(math.log(st.prob) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }

    /** Viterbi segmentation of one word: maximize Σ llq, ties → fewer
      * tokens, then the smaller piece length for the last step
      * (candidates scan k ascending with strict improvement).
      */
    def segment(word: String): Seq[String] = {
      val L = word.length
      if (L == 0) return Nil
      val score = new Array[Long](L + 1)
      val ntok = new Array[Int](L + 1)
      val back = new Array[Int](L + 1) // piece length ending at j
      var j = 1
      while (j <= L) {
        var bestS = Long.MinValue
        var bestN = Int.MaxValue
        var bestK = 0
        var k = 1
        while (k <= math.min(maxPieceLen, j)) {
          val piece = word.substring(j - k, j)
          val pq = llq.get(piece) match {
            case Some(q) => Some(q)
            case None if k == 1 => Some(UnkLlq)
            case None => None
          }
          pq.foreach { q =>
            val s = score(j - k) + q
            val n = ntok(j - k) + 1
            if (s > bestS || (s == bestS && n < bestN)) {
              bestS = s; bestN = n; bestK = k
            }
          }
          k += 1
        }
        score(j) = bestS; ntok(j) = bestN; back(j) = bestK
        j += 1
      }
      val out = List.newBuilder[String]
      val rev = scala.collection.mutable.ArrayBuffer.empty[String]
      var p = L
      while (p > 0) { rev += word.substring(p - back(p), p); p -= back(p) }
      out ++= rev.reverse
      out.result()
    }

    def tokenCount(word: String): Int = segment(word).length

    /** The Viterbi optimum's (score, token count) WITHOUT
      * materializing the path — the per-word unit of document LM
      * scoring ([[UnigramLm.tokenScores]]). Same DP and tie-break as
      * [[segment]]; the score is tie-invariant (equal by definition
      * of a tie), the count is the fewer-tokens winner.
      */
    def scoreCount(word: String): (Long, Int) = {
      val L = word.length
      if (L == 0) return (0L, 0)
      val score = new Array[Long](L + 1)
      val ntok = new Array[Int](L + 1)
      var j = 1
      while (j <= L) {
        var bestS = Long.MinValue
        var bestN = Int.MaxValue
        var k = 1
        while (k <= math.min(maxPieceLen, j)) {
          val piece = word.substring(j - k, j)
          val pq = llq.get(piece) match {
            case s @ Some(_) => s
            case None if k == 1 => Some(UnkLlq)
            case None => None
          }
          pq.foreach { q =>
            val s = score(j - k) + q
            val n = ntok(j - k) + 1
            if (s > bestS || (s == bestS && n < bestN)) { bestS = s; bestN = n }
          }
          k += 1
        }
        score(j) = bestS; ntok(j) = bestN
        j += 1
      }
      (score(L), ntok(L))
    }

    /** Deterministic n-best segmentations — the oracle-checkable half
      * of Kudo '18's subword regularization (the stochastic sampler
      * draws from exactly this lattice; a deterministic k-best list
      * with exact integer scores is what an external SQL engine can
      * replay): up to `k` (score_q, n_tokens, segmentation) triples
      * ranked by score desc, then FEWER tokens, then the
      * piece-sequence string ascending (pieces joined with '|') — a
      * total order, so both engines agree on every rank. Same UNK
      * contract as [[segment]] (unknown single chars at [[UnkLlq]]).
      * Rank 1 matches [[segment]]'s (score, count) optimum; on full
      * (score, count) ties the explicit seg-string order may pick a
      * different witness than segment's first-shorter-piece scan.
      */
    def nBestSegmentations(word: String, k: Int): Vector[(Long, Int, String)] = {
      require(k >= 1, s"k must be >= 1, got $k")
      val L = word.length
      if (L == 0) return Vector.empty
      val states = new Array[Vector[(Long, Int, String)]](L + 1)
      states(0) = Vector((0L, 0, ""))
      var j = 1
      while (j <= L) {
        val cand = Vector.newBuilder[(Long, Int, String)]
        var l = 1
        while (l <= math.min(maxPieceLen, j)) {
          val piece = word.substring(j - l, j)
          val q = llq.get(piece) match {
            case s @ Some(_) => s
            case None if l == 1 => Some(UnkLlq)
            case None => None
          }
          q.foreach { x =>
            states(j - l).foreach { case (s, n, seg) =>
              cand += ((s + x, n + 1,
                if (seg.isEmpty) piece else seg + "|" + piece))
            }
          }
          l += 1
        }
        states(j) = cand.result()
          .sortBy { case (s, n, seg) => (-s, n, seg) }.take(k)
        j += 1
      }
      states(L)
    }
  }

  private def halfUp(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Train on a corpus: one distributed word-frequency aggregate, then
    * driver-side seed selection + `iters` EM steps over the bounded
    * vocabulary.
    */
  def fit(df: DataFrame, textCol: String, maxPieceLen: Int = 4,
          seedMulti: Int = 100, iters: Int = 1,
          maxVocab: Int = 50000): UnigramModel = {
    require(maxPieceLen >= 1 && seedMulti >= 0 && iters >= 1 && maxVocab > 0,
      s"bad maxPieceLen=$maxPieceLen seedMulti=$seedMulti iters=$iters maxVocab=$maxVocab")
    val spark = df.sparkSession
    import spark.implicits._
    // FanOut: the explode + map-side partial count is row-proportional
    // work that otherwise runs inside the (single-split at bench) scan task
    val vocab: Array[(String, Long)] = FanOut(df.select(col(textCol)))
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxVocab)
      .as[(String, Long)].collect()
    fitOnVocab(vocab, maxPieceLen, seedMulti, iters)
  }

  /** Seed + EM over a weighted word vocabulary, public for fixture-level
    * testing.
    */
  private[operators] def fitOnVocab(vocab: Array[(String, Long)],
                                    maxPieceLen: Int, seedMulti: Int,
                                    iters: Int): UnigramModel = {
    // seed scores: exact long occurrence sums over every ≤ M-char window
    val scores = new java.util.HashMap[String, Long]()
    vocab.foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        var k = 1
        while (k <= maxPieceLen && i + k <= w.length) {
          scores.merge(w.substring(i, i + k), f, (a, b) => a + b)
          k += 1
        }
        i += 1
      }
    }
    import scala.jdk.CollectionConverters._
    val all = scores.asScala.toSeq
    val chars = all.filter(_._1.length == 1)
    val multi = all.filter(_._1.length > 1)
      .sortBy { case (p, s) => (-s, p) } // score desc, piece asc
      .take(seedMulti)
    val seed: Map[String, Long] = (chars ++ multi).toMap
    val seedTotal = seed.valuesIterator.sum
    val probs0: Map[String, Double] =
      seed.map { case (p, s) => p -> s.toDouble / seedTotal }
    val (lastExpq, probs) = emSteps(vocab, seed.keySet, probs0, maxPieceLen, iters)
    UnigramModel(
      seed.map { case (p, s) =>
        p -> PieceStat(s, lastExpq.getOrElse(p, 0L), probs(p))
      },
      maxPieceLen)
  }

  /** The EM loop over a weighted word vocabulary with a FIXED piece
    * set: `iters` E/M rounds from `probsInit`, returning the LAST
    * round's quantized expected counts and the final probabilities.
    * Shared by the plain fit and the prune round (the prune re-enters
    * with the survivor set and renormalized probs).
    */
  private def emSteps(vocab: Array[(String, Long)], pieces: Set[String],
                      probsInit: Map[String, Double], maxPieceLen: Int,
                      iters: Int): (Map[String, Long], Map[String, Double]) = {
    import scala.jdk.CollectionConverters._
    var probs = probsInit
    var lastExpq: Map[String, Long] = Map.empty
    var it = 0
    while (it < iters) {
      val expq = new java.util.HashMap[String, Long]()
      vocab.foreach { case (w, f) =>
        val L = w.length
        // forward: k folds ascending from a 0.0 seed — the oracle's
        // parenthesization, bit-identical
        val alpha = new Array[Double](L + 1)
        alpha(0) = 1.0
        var j = 1
        while (j <= L) {
          var acc = 0.0
          var k = 1
          while (k <= math.min(maxPieceLen, j)) {
            probs.get(w.substring(j - k, j)) match {
              case Some(p) => acc = acc + p * alpha(j - k)
              case None =>
            }
            k += 1
          }
          alpha(j) = acc
          j += 1
        }
        val z = alpha(L)
        if (z > 0.0) {
          val beta = new Array[Double](L + 1)
          beta(L) = 1.0
          var b = L - 1
          while (b >= 0) {
            var acc = 0.0
            var k = 1
            while (k <= math.min(maxPieceLen, L - b)) {
              probs.get(w.substring(b, b + k)) match {
                case Some(p) => acc = acc + p * beta(b + k)
                case None =>
              }
              k += 1
            }
            beta(b) = acc
            b -= 1
          }
          // per-occurrence expected counts, quantized to 1e-9 units —
          // the M-step sums LONGS so accumulation order cannot matter
          var i = 0
          while (i < L) {
            var k = 1
            while (k <= maxPieceLen && i + k <= L) {
              probs.get(w.substring(i, i + k)).foreach { p =>
                val c = f * (((alpha(i) * p) * beta(i + k)) / z)
                val cq = halfUp(c * 1e9)
                if (cq != 0L) expq.merge(w.substring(i, i + k), cq, (x, y) => x + y)
              }
              k += 1
            }
            i += 1
          }
        }
      }
      val snap = expq.asScala.toMap.withDefaultValue(0L)
      val tot = snap.valuesIterator.sum
      lastExpq = pieces.iterator.map(p => p -> snap(p)).toMap
      probs =
        if (tot == 0L) probs
        else pieces.iterator.map(p => p -> (snap(p).toDouble / tot.toDouble)).toMap
      it += 1
    }
    (lastExpq, probs)
  }

  /** The full Kudo '18 training loop: seed + EM, then a PRUNE round —
    * keep every single character (coverage) plus the `keepMulti`
    * multi-char pieces with the highest expected counts (ties
    * piece-ascending; expected-count mass is the standard
    * likelihood-loss proxy: a piece the lattice barely uses cannot
    * hurt much by leaving), renormalize over the survivors, and run
    * `finalIters` more EM steps on the pruned vocabulary. Same
    * determinism contract as [[fit]] — exact long ranks, long-sum
    * M-steps — so the whole two-phase train is SQL-replayable (q252).
    */
  def fitPruned(df: DataFrame, textCol: String, maxPieceLen: Int = 4,
                seedMulti: Int = 100, emIters: Int = 1, keepMulti: Int = 50,
                finalIters: Int = 1, maxVocab: Int = 50000): UnigramModel = {
    require(keepMulti >= 0 && finalIters >= 1, s"bad keepMulti=$keepMulti finalIters=$finalIters")
    val spark = df.sparkSession
    import spark.implicits._
    val vocab: Array[(String, Long)] = FanOut(df.select(col(textCol)))
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxVocab)
      .as[(String, Long)].collect()
    val phase1 = fitOnVocab(vocab, maxPieceLen, seedMulti, emIters)
    val stats = phase1.pieces.toSeq
    val kept: Map[String, PieceStat] = (stats.filter(_._1.length == 1) ++
      stats.filter(_._1.length > 1)
        .sortBy { case (p, st) => (-st.expq, p) } // expq desc, piece asc
        .take(keepMulti)).toMap
    val keptTotal = kept.valuesIterator.map(_.expq).sum
    val probs2: Map[String, Double] =
      if (keptTotal == 0L) kept.map { case (p, st) => p -> st.prob }
      else kept.map { case (p, st) => p -> (st.expq.toDouble / keptTotal.toDouble) }
    val (expqF, probsF) = emSteps(vocab, kept.keySet, probs2, maxPieceLen, finalIters)
    UnigramModel(
      kept.map { case (p, st) =>
        p -> PieceStat(st.seedScore, expqF.getOrElse(p, 0L), probsF(p))
      },
      maxPieceLen)
  }

  /** The trained model as a table (piece, seed_score, expq, prob) —
    * what q250's oracle replays end to end.
    */
  def modelTable(spark: org.apache.spark.sql.SparkSession,
                 model: UnigramModel): DataFrame = {
    import spark.implicits._
    model.pieces.toSeq
      .map { case (p, st) => (p, st.seedScore, st.expq, st.prob) }
      .toDF("piece", "seed_score", "expq", "prob")
  }

  /** Corpus-level n-best table: up to `k` ranked segmentations per
    * DISTINCT corpus word — (w, rk, score_q, n_tokens, seg), output
    * bounded by vocab × k. One distinct aggregate (the only shuffle),
    * then a map-side flatMap under the broadcast model.
    */
  def nBestTable(df: DataFrame, textCol: String, model: UnigramModel,
                 k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    df.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct()
      .as[String]
      .flatMap { w =>
        bc.value.nBestSegmentations(w, k).zipWithIndex.map {
          case ((s, n, seg), i) => (w, (i + 1).toLong, s, n.toLong, seg)
        }
      }
      .toDF("w", "rk", "score_q", "n_tokens", "seg")
  }

  /** [[tokenCounts]] plus the document's exact LM log-likelihood: the
    * sum over words of the Viterbi path's integer micro-log score —
    * a LONG sum, order-free, hash-matchable. Output:
    * (id, n_words, n_tokens, llq). What perplexity filtering
    * ([[PerplexityBuckets]]) consumes; same map-side shape.
    */
  def tokenScores(df: DataFrame, idCol: String, textCol: String,
                  model: UnigramModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    // FanOut: the per-word Viterbi below is row-proportional CPU with no
    // shuffle of its own — a 1-split scan would run it on one core
    FanOut(df.select(col(idCol).cast("long"), lower(trim(col(textCol)))))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = bc.value
        val cache = new java.util.HashMap[String, (Long, Int)]()
        it.map { case (id, text) =>
          var nWords = 0L
          var nTok = 0L
          var llqSum = 0L
          text.split("\\s+").iterator.filter(_.nonEmpty).foreach { w =>
            nWords += 1
            var t = cache.get(w)
            if (t == null) { t = m.scoreCount(w); cache.put(w, t) }
            llqSum += t._1
            nTok += t._2
          }
          (id, nWords, nTok, llqSum)
        }
      }
      .toDF(idCol, "n_words", "n_tokens", "llq")
  }

  /** Map-side corpus token counting under a trained model: broadcast
    * llq, per-partition word memo cache (Zipf makes its hit rate the
    * dominant term), zero shuffles. Output: (id, n_words, n_tokens).
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
                  model: UnigramModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    // FanOut: same reasoning as [[tokenScores]]
    FanOut(df.select(col(idCol).cast("long"), lower(trim(col(textCol)))))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = bc.value
        val cache = new java.util.HashMap[String, Int]()
        it.map { case (id, text) =>
          var nWords = 0L
          var nTok = 0L
          text.split("\\s+").iterator.filter(_.nonEmpty).foreach { w =>
            nWords += 1
            var t = cache.get(w) // 0 when absent: no word tokenizes to 0
            if (t == 0) { t = m.tokenCount(w); cache.put(w, t) }
            nTok += t
          }
          (id, nWords, nTok)
        }
      }
      .toDF(idCol, "n_words", "n_tokens")
  }
}
