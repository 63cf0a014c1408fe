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
                                      numMerges: Int): BpeModel =
    trainOnSymbolVocab(vocab.map { case (w, n) =>
      ((w.map(_.toString) :+ EndOfWord).toArray, n)
    }, numMerges)

  /** The core merge learner over an ALREADY-SYMBOLIZED vocabulary —
    * shared by the char+`</w>` trainer above and the byte-level trainer
    * ([[trainBytes]], which symbolizes into the 256-char byte alphabet
    * and needs no end-of-word marker: the chunk boundary IS the word
    * boundary, with `Ġ` carrying the leading space).
    */
  private def trainOnSymbolVocab(vocab: Array[(Array[String], Long)],
                                 numMerges: Int): BpeModel = {
    var words: Array[(Array[String], Long)] = vocab
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
  private[operators] def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] =
    mergeLoop((word.map(_.toString) :+ EndOfWord).toArray, ranks)

  /** The rank-greedy merge application shared by the `</w>` and
    * byte-level encoders.
    */
  private def mergeLoop(init: Array[String],
                        ranks: Map[(String, String), Int]): Array[String] = {
    var syms = init
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

  // ------------------------------------------------------------------
  // Byte-level BPE (the GPT-2 convention, Radford et al. 2019 §2.2):
  // the base alphabet is the 256 BYTE values, so every string — emoji,
  // CJK, mixed scripts, control chars — tokenizes losslessly with ZERO
  // possible OOV. The whitespace-lowercase trainer above approximates
  // token budgets for such text; this is the exact path.
  // ------------------------------------------------------------------

  /** The GPT-2 byte↔unicode table: printable latin-1 bytes map to
    * themselves; the other 68 bytes map to 256+k (k in ascending byte
    * order), keeping every symbol a single visible code point. The
    * well-known markers fall out: space→`Ġ` (U+0120), `\n`→`Ċ`
    * (U+010A), `\t`→`ĉ` (U+0109).
    */
  val byteToChar: Array[Char] = {
    val printable = (33 to 126) ++ (161 to 172) ++ (174 to 255)
    val isPrintable = printable.toSet
    val out = new Array[Char](256)
    var k = 0
    (0 to 255).foreach { b =>
      if (isPrintable(b)) out(b) = b.toChar
      else { out(b) = (256 + k).toChar; k += 1 }
    }
    out
  }

  private val charToByte: Map[Char, Byte] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap

  /** GPT-2-style pretokenization, simplified but LOSSLESS: each chunk
    * is either (one optional leading space + a non-space run) or a
    * whitespace run — a run before a word yields its last space to the
    * word (the `\s+(?!\S)` lookahead), so `"a  b"` → `"a"`, `" "`,
    * `" b"`. Chunks concatenate back to the input exactly; BPE merges
    * never cross a chunk boundary.
    */
  private val PretokenPattern =
    java.util.regex.Pattern.compile(" ?[^\\s]+|\\s+(?!\\S)|\\s+")

  def pretokenize(text: String): Vector[String] = {
    if (text == null || text.isEmpty) return Vector.empty
    val m = PretokenPattern.matcher(text)
    val out = Vector.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** A chunk as a string over the byte alphabet (UTF-8 bytes mapped
    * through [[byteToChar]]) — what the byte-level merges operate on.
    */
  def toByteChars(chunk: String): String = {
    val bytes = chunk.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    bytes.foreach(b => sb.append(byteToChar(b & 0xff)))
    sb.toString
  }

  /** Inverse of [[toByteChars]]: byte-alphabet string → original text.
    * Total on the encoder's image; unknown chars throw (they cannot be
    * produced by [[toByteChars]] and would silently corrupt bytes).
    */
  def fromByteChars(s: String): String = {
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      bytes(i) = charToByte.getOrElse(s.charAt(i),
        throw new IllegalArgumentException(
          s"char U+${s.charAt(i).toInt.toHexString} is not in the byte alphabet"))
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Detokenize byte-level tokens: concatenate and map back through
    * the byte table. `decode(encode(text)) == text` for EVERY string —
    * the zero-OOV guarantee q256 hash-gates per document.
    */
  def decodeBytes(tokens: Seq[String]): String =
    fromByteChars(tokens.mkString)

  /** Train byte-level merges: one distributed chunk-frequency count
    * (the [[train]] scale split — corpus-sized work distributed,
    * merge learning on the bounded top-`maxVocab` chunk vocabulary),
    * chunks symbolized into the byte alphabet, NO end-of-word marker
    * (`Ġ` already encodes the boundary). Case is preserved — byte
    * level exists for losslessness, and lowercasing would break it.
    */
  def trainBytes(df: DataFrame, textCol: String, numMerges: Int,
                 maxVocab: Int = 50000): BpeModel = {
    require(numMerges >= 0 && maxVocab > 0, s"bad numMerges=$numMerges maxVocab=$maxVocab")
    val spark = df.sparkSession
    import spark.implicits._
    val vocab: Array[(String, Long)] = df
      .select(col(textCol).cast("string").as("t"))
      .filter(col("t").isNotNull)
      .as[String]
      .flatMap(pretokenize(_))
      .toDF("w")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxVocab)
      .as[(String, Long)].collect()
    trainOnSymbolVocab(
      vocab.map { case (w, n) =>
        (toByteChars(w).map(_.toString).toArray, n) },
      numMerges)
  }

  /** Map-side byte-level corpus tokenization: broadcast ranks,
    * per-partition chunk memo cache, zero shuffles — [[encode]]'s
    * shape with the byte-alphabet symbolization and no `</w>`.
    */
  def encodeBytes(df: DataFrame, idCol: String, textCol: String,
                  model: BpeModel): Dataset[BpeTokens] = {
    val spark = df.sparkSession
    import spark.implicits._
    val merges = model.merges
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ranks = BpeModel(merges).ranks
        val cache = new java.util.HashMap[String, Array[String]]()
        it.map { case (id, text) =>
          val tokens = pretokenize(text).iterator.flatMap { w =>
            var t = cache.get(w)
            if (t == null) {
              t = mergeLoop(toByteChars(w).map(_.toString).toArray, ranks)
              cache.put(w, t)
            }
            t
          }.toArray
          BpeTokens(id, tokens)
        }
      }
  }
}
