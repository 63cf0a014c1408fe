package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter join pre-filtering: build a bloom filter over the (small,
  * usually pre-filtered) dim side's join key and drop non-matching fact
  * rows BEFORE the join shuffle — the explicit form of the runtime
  * row-level filtering Spark's AQE injects only in favourable plans. At
  * 100 TB this is the difference between shuffling the whole fact table
  * and shuffling the ~selectivity fraction that can possibly match.
  * False positives pass the bloom and are eliminated by the exact join,
  * so the RESULT is byte-identical to the plain join (which is exactly
  * what the oracle checks); false-positive rate only costs shuffle
  * bytes, tunable via `fpp`.
  *
  * The filter is built with one aggregation job over the dim keys
  * (`DataFrameStatFunctions.bloomFilter` — Spark's own sketch, merged
  * tree-wise, never collected as raw keys) and ships to executors as a
  * broadcast variable, NOT a closure capture (a bloom at 1% fpp over
  * 10M keys is ~11 MiB — broadcast once per executor, not per task).
  */
object PrefilterJoin {

  /** Inner equi-join fact ⨝ dim on long keys, bloom-prefiltered.
    * Null fact keys never match an inner join and are dropped by the
    * prefilter directly.
    *
    * `expectedItems` sizes the filter's bit array; pass <= 0 (the
    * default) to derive it from a `dim.count()` pre-pass. An explicit
    * value saves that scan but is a SCALE TRAP: a filter sized for K
    * keys saturates once the dim outgrows it (every bit set, fpp → 1)
    * and silently degrades to "shuffle the whole fact table anyway,
    * plus the bloom build and a per-row probe for nothing" — measured
    * at the 100× bench, where a 200k-sized filter over a 3M-key dim
    * made the prefilter pure overhead. The count is one narrow scan of
    * the (small, pre-filtered) dim side — the side whose smallness is
    * the reason to bloom-prefilter at all.
    */
  def bloomJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                dimKey: String, expectedItems: Long = -1L,
                fpp: Double = 0.01): DataFrame = {
    val items = if (expectedItems > 0) expectedItems
                else math.max(1L, dim.count())
    val bloom = dim.stat.bloomFilter(dimKey, items, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    fact.filter(mightContain(col(factKey)))
      .join(dim, col(factKey) === col(dimKey))
  }
}
