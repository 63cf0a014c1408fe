package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for LLM context windows: overlapping token windows
  * of `size` tokens every `stride` tokens — the step between cleaned
  * documents and an embedding/training pipeline (RAG indexing, context-
  * length packing). No reference implementation (SURVEY.md §7.4
  * LLM-pipeline category).
  *
  * Pure map-side generator: `split` once, one `transform` over the
  * (bounded, = ceil(n/stride)) start offsets, `posexplode` — no shuffle,
  * no UDF; row amplification is the OUTPUT contract (one row per chunk),
  * not an implementation artifact. Token order and case are preserved
  * (chunks are re-joined with single spaces — byte-identical to the
  * original only for single-space-separated text; the normalization is
  * deliberate and documented so the DuckDB oracle can mirror it).
  *
  * Chunk starts are 0, stride, 2·stride, … < n_tokens; the final chunks
  * are shorter than `size` (standard tail behavior — a tail shorter
  * than the overlap still appears exactly once).
  */
object Chunking {

  def chunkStarts(toks: Column, stride: Int): Column =
    filter(transform(sequence(lit(0), ((size(toks) - 1) / stride).cast("int")),
      i => i * stride), s => s < size(toks))

  /** (id, chunk_id, chunk_text, n_tokens) — one row per chunk. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  size_ : Int, stride: Int): DataFrame = {
    require(size_ > 0 && stride > 0 && stride <= size_,
      s"need 0 < stride <= size, got size=${size_} stride=$stride")
    val toks = split(col(textCol), "\\s+")
    df.select(col(idCol), posexplode(
        transform(chunkStarts(toks, stride), s => slice(toks, s + 1, lit(size_)))))
      .select(col(idCol),
        col("pos").cast("long").as("chunk_id"),
        array_join(col("col"), " ").as("chunk_text"),
        size(col("col")).cast("long").as("n_tokens"))
  }
}
