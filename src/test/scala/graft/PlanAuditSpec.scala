package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan regression gate for the scale-critical queries: the
  * properties that make these plans survive a 100× scale-up are asserted
  * here, so a refactor that silently reintroduces a cartesian, drops a
  * pushdown, or un-broadcasts a dim join fails CI — not a bench review
  * three rounds later. Runs on sf0.001; plan SHAPE does not depend on SF
  * (only AQE's broadcast thresholds do, which is why the broadcast
  * assertions check the operator, not sizes).
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Materialize (AQE settles the final plan on execution), then return
    * the formatted executed plan.
    */
  private def planOf(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val s = df.queryExecution.explainString(FormattedMode)
    Caches.unpersistAll()
    s
  }

  test("q02 filter+project: predicates and pruning reach the parquet scan") {
    val p = planOf("q02_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThan") || p.contains("IsNotNull"),
      s"expected pushed predicates in scan:\n$p")
    // projection pruning: the scan must not read all 16 lineitem columns
    val readSchema = "ReadSchema: struct<(.*?)>".r.findFirstMatchIn(p).map(_.group(1))
    assert(readSchema.exists(_.split(",").length <= 6),
      s"scan should read only the projected/filtered columns:\n$readSchema")
  }

  test("q03 star join: dims broadcast, fact side never shuffles for the join") {
    val p = planOf("q03_join_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q40 global top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = planOf("q40_global_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q42 range join: bucketed equi-join, no nested-loop cartesian") {
    val p = planOf("q42_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q26 blocked cosine pairs: no nested-loop cartesian either") {
    val p = planOf("q26_cosine_pairs")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q141 rrf fusion: lexical run is token-keyed, no queries x corpus product") {
    // the lexical retrieval leg must plan as a hash join on token (the
    // inverted-index shape) — a BroadcastNestedLoopJoin/CartesianProduct
    // here would be the unbounded queries x corpus trap the r8 verdict
    // flagged (every doc scored against every query regardless of
    // shared vocabulary)
    val p = planOf("q141_rrf_fusion")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"lexical run must join on token, not cross-score:\n$p")
  }

  test("q147/q151 substring dedup: no cartesian, gram count partial-aggregates") {
    for (name <- Seq("q147_substring_dedup", "q151_substring_cut")) {
      val p = planOf(name)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name must stay join-keyed:\n$p")
      // the corpus-sized occurrence count must map-side combine before
      // its exchange (partial_count below the shuffle)
      assert(p.contains("partial_count") || p.contains("Partial"),
        s"$name gram count should partial-aggregate:\n$p")
    }
  }

  test("q19 dense id: no single-partition window") {
    val p = planOf("q19_dense_id")
    assert(!p.contains("Window"), s"denseId must not fall back to a global window:\n$p")
    assert(!p.contains("SinglePartition"), p)
  }

  test("q45 hash split and q46 pii scrub: one shuffle each (their aggregate/sort only)") {
    // labeling and scrubbing are map-side; the only exchanges allowed are
    // the declared aggregation/ordering of the query output itself.
    // (simple-string plan: each node appears once, unlike FormattedMode)
    for (name <- Seq("q45_hash_split", "q46_pii_scrub")) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      val p = df.queryExecution.executedPlan.toString
      Caches.unpersistAll()
      val exchanges = "Exchange".r.findAllIn(p).length
      assert(exchanges <= 2, s"$name should not add shuffles beyond its agg/sort:\n$p")
    }
  }

  test("q51 bloom join: the fact-side prefilter sits BELOW the join") {
    val df = SparkEntry.queries("q51_bloom_join")(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    Caches.unpersistAll()
    // the bloom UDF filter must apply on the scan side, before any
    // exchange/join — if it floats above the join it filters nothing
    val filterIdx = p.indexOf("Filter")
    val joinIdx = math.max(p.indexOf("HashJoin"), p.indexOf("SortMergeJoin"))
    assert(filterIdx > joinIdx && joinIdx >= 0,
      s"prefilter should appear under the join in the plan tree:\n$p")
  }

  test("q53 cdc merge: exactly one key shuffle for the window, hash-partitioned") {
    val df = SparkEntry.queries("q53_cdc_merge")(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    Caches.unpersistAll()
    // union is free; the merge itself is one hashpartitioning exchange
    // (+ the query's own output sort)
    val hashExchanges = "hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1, s"merge should shuffle once on the key:\n$p")
    assert(!p.contains("SinglePartition") || p.contains("rangepartitioning"), p)
  }

  test("q01 aggregate: partial then final hash aggregation (map-side combine)") {
    val p = planOf("q01_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      s"expected partial+final HashAggregate:\n$p")
    assert(!p.contains("SortAggregate"), p)
  }

  test("q57 bm25: only broadcast joins — no corpus-keyed shuffle join anywhere") {
    val p = planOf("q57_bm25")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"dfreq/stats must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"stats cross join must be broadcast, not cartesian:\n$p")
    // dl rides along on the token rows; the old corpus-wide doc-length
    // join must never come back
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"no shuffle join belongs in bm25:\n$p")
  }

  test("q58 quantization: map-side kernel — no Exchange before the sort") {
    val df = SparkEntry.queries("q58_quantize_int8")(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    Caches.unpersistAll()
    // the only exchange allowed is the final orderBy's range partitioning
    assert(!p.contains("hashpartitioning"), s"quantization must not hash-shuffle:\n$p")
  }

  test("q59 packing: the two-phase scan costs one range shuffle, no single-partition window") {
    val df = SparkEntry.queries("q59_pack_concat")(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    Caches.unpersistAll()
    assert(!p.contains("Window"), s"global prefix sum must not use a window:\n$p")
    assert(!p.contains("SinglePartition"), s"no single-partition exchange:\n$p")
  }

  test("q62 per-source cap: one hash shuffle for the group window") {
    val df = SparkEntry.queries("q62_source_cap")(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    Caches.unpersistAll()
    // window + aggregate share the same source-hash partitioning: the
    // exchange must appear once, reused downstream
    val hashExchanges = "hashpartitioning\\(source".r.findAllIn(p).length
    assert(hashExchanges <= 1, s"cap window and count should reuse one source shuffle:\n$p")
  }

  test("q63 incremental merge: hash aggregates only — no join, no sort-agg, no window") {
    val p = planOf("q63_incremental_agg")
    assert(!p.contains("SortMergeJoin") && !p.contains("SortAggregate") && !p.contains("Window"),
      s"partial-form merge must stay in hash aggregation:\n$p")
  }

  test("q70/q71 curation scalars: map-side except the final sort (and q70's 1-row max broadcast)") {
    Seq("q70_weighted_sample", "q71_url_normalize").foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      val p = df.queryExecution.executedPlan.toString
      Caches.unpersistAll()
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        s"$name must not shuffle-join:\n$p")
      assert(!p.contains("Window"), s"$name must not window:\n$p")
    }
  }

  test("q72 vocab top-k: TakeOrderedAndProject, partial agg before the token shuffle") {
    val df = SparkEntry.queries("q72_vocab_topk")(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    Caches.unpersistAll()
    // top-100 must be a bounded-heap TakeOrdered, never a global sort
    assert(p.contains("TakeOrderedAndProject"), s"top-k should TakeOrdered:\n$p")
    assert(!p.contains("Window"), s"no window needed for global top-k:\n$p")
    // the token aggregate must combine map-side (partial_count before the
    // exchange), so the shuffle carries vocabulary, not corpus
    assert(p.contains("partial_count") || p.contains("partial"),
      s"vocab agg should partial-aggregate before the shuffle:\n$p")
  }

  test("q73 tf-idf: term-keyed exchange reused between the df agg and the join") {
    val df = SparkEntry.queries("q73_tfidf")(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    Caches.unpersistAll()
    assert(!p.contains("CartesianProduct"), s"stats join must broadcast:\n$p")
    // (id, term) agg then term agg then term join: the term-hash exchange
    // feeding the df aggregate is the same distribution the join needs —
    // Spark must reuse it rather than shuffle the tf table twice
    assert(p.contains("ReusedExchange") || "hashpartitioning\\(term".r.findAllIn(p).length <= 2,
      s"tf table should not re-shuffle on term for the join:\n$p")
  }

  test("q75 pmi: bigrams generated map-side — no join below the count aggregates") {
    val df = SparkEntry.queries("q75_pmi_collocations")(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    Caches.unpersistAll()
    assert(!p.contains("CartesianProduct"), s"pmi must not cartesian:\n$p")
    // top-100 bounded heap, not a global sort of the bigram table
    assert(p.contains("TakeOrderedAndProject"), s"pmi top-k should TakeOrdered:\n$p")
    // the token table must never self-join: every join input is an
    // aggregate (vocabulary-sized), not a raw explode
    assert(!p.contains("Generate explode") || p.indexOf("Generate") > p.indexOf("Join") ||
      "HashAggregate".r.findAllIn(p).length >= 4,
      s"bigram/unigram counts must aggregate before any join:\n$p")
  }

  test("q76 rolling window and q77 scd2: one key shuffle, value-based frames, no join") {
    for (name <- Seq("q76_rolling_window", "q77_scd2")) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      val p = df.queryExecution.executedPlan.toString
      Caches.unpersistAll()
      assert(!p.contains("Join"), s"$name must not self-join:\n$p")
      val hashExchanges = "hashpartitioning".r.findAllIn(p).length
      assert(hashExchanges == 1, s"$name should shuffle once on its key:\n$p")
    }
  }

  test("q78 quality model and q79 entropy: map-side kernels — no hash shuffle at all") {
    for (name <- Seq("q78_quality_model", "q79_token_entropy")) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      val p = df.queryExecution.executedPlan.toString
      Caches.unpersistAll()
      assert(!p.contains("hashpartitioning"),
        s"$name is a per-row projection; only the output sort may shuffle:\n$p")
      assert(!p.contains("Window") && !p.contains("Join"), s"$name:\n$p")
    }
  }

  test("q83 heavy hitters: sketch candidates broadcast back — no vocabulary-wide shuffle join") {
    val df = SparkEntry.queries("q83_heavy_hitters")(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    Caches.unpersistAll()
    assert(p.contains("BroadcastHashJoin"), s"candidate membership must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffle join in the re-count pass:\n$p")
    assert(p.contains("ObjectHashAggregate"), s"MG sketch is an object aggregate:\n$p")
  }

  test("q84 funnel: single user-key shuffle, no k-way self-join") {
    val df = SparkEntry.queries("q84_funnel")(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    Caches.unpersistAll()
    // the only join allowed is the broadcast of the |steps|-row spine
    // (zero-conversion stages must still emit); a per-step self-join
    // would shuffle the event table once per stage
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"funnel must not shuffle-join:\n$p")
    // the step-type filter must reach the scan
    assert(p.contains("PushedFilters: [In(event_type") || p.contains("isnotnull"),
      s"step filter should push down:\n$p")
  }

  test("q65 span dedup: hash-keyed joins only, chunk text never in the first-occurrence shuffle") {
    val df = SparkEntry.queries("q65_span_dedup")(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    Caches.unpersistAll()
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"span-dedup join must be equi:\n$p")
    // first-occurrence aggregate carries (md5, packed-long) only — the
    // chunk text must not appear in its aggregate expressions
    val firstAgg = p.linesIterator.filter(_.contains("min(__k")).mkString("\n")
    assert(firstAgg.nonEmpty && !firstAgg.contains("chunk_text"),
      s"first-occurrence agg should not carry chunk text:\n$p")
  }

  test("q97 snapshot diff: date filters pushed, agg exchanges feed the full-outer join directly") {
    val p = planOf("q97_snapshot_diff")
    assert(p.contains("GreaterThanOrEqual(o_orderdate") &&
      p.contains("LessThan(o_orderdate"), s"date predicates must push down:\n$p")
    // key-partitioned aggregate outputs satisfy the join distribution:
    // both Exchanges sit below the aggregates, none between agg and join
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("q100 transitions: the raw table shuffles once; agg + normalization run matrix-sized") {
    val p = planOf("q100_transitions")
    assert(!p.contains("Join"), s"transitions must not self-join:\n$p")
    // one window for lead (key exchange), one for normalization (matrix
    // exchange), one range exchange for the final sort — nothing else
    val exchanges = "Exchange (?:hash|range)partitioning".r.findAllIn(p).length
    assert(exchanges <= 3, s"expected <= 3 exchanges, got $exchanges:\n$p")
  }

  test("q102 inverted index: posting cap plans as WindowGroupLimit below the full window") {
    val p = planOf("q102_inverted_index")
    // row_number <= maxPostings is pushed into the sort as a per-group
    // top-k (WindowGroupLimit) — the plan property that keeps a stopword's
    // posting list from ever materializing
    assert(p.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("q111 semantic dedup: cell self-join is an equi-join, no cartesian") {
    val p = planOf("q111_semantic_dedup")
    // the only pairwise stage is the within-cell self-join — it must plan
    // as a hash equi-join on cell (Σ|cell|² work), never a nested loop
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("q112 lm cross-entropy: doc bigrams collapse with partial aggregation before any join") {
    val p = planOf("q112_lm_crossentropy")
    // per-(doc,bigram) multiplicities must partial-aggregate (map-side
    // combine) below the model joins — a per-token row crossing a join
    // would be the corpus-sized shuffle the operator exists to avoid
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(!p.contains("Window"), s"no window needed anywhere:\n$p")
  }

  test("q113 pagerank: per-iteration lineage is truncated — the final plan does not grow with iterations") {
    // the executed plan of the LAST iteration must read the previous
    // ranks from a checkpointed scan, not replay all prior iterations:
    // a constant number of joins regardless of iteration count
    val df: DataFrame = SparkEntry.queries("q113_pagerank")(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.explainString(FormattedMode)
    Caches.unpersistAll()
    val joins = "Join".r.findAllIn(p).length
    assert(joins <= 6, s"expected a constant-size (<= 2-join) final-iteration plan, got $joins Join tokens:\n$p")
    assert(p.contains("Scan ExistingRDD") || p.contains("LocalTableScan"),
      s"expected the checkpointed rank table as a scan:\n$p")
  }

  test("q117 bitmap distinct: two aggregation shuffles carrying sketches, no join, no window") {
    val p = planOf("q117_bitmap_distinct")
    // TypedImperativeAggregate plans as ObjectHashAggregate with a
    // partial/final split — the shuffle between them carries partial
    // SKETCHES, never raw user_ids
    assert(p.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate:\n$p")
    assert(!p.contains("SortAggregate"),
      s"sketch aggregation must stay hash-based, not sort-based:\n$p")
    // formatted mode prints each operator twice (tree + detail) — count
    // tree nodes only
    val exchanges = "Exchange \\(\\d+\\)".r.findAllIn(p).length
    // shard groupBy + rollup groupBy + the final orderBy range exchange
    assert(exchanges <= 3, s"expected <= 3 exchanges, got $exchanges:\n$p")
    assert(!p.contains("Join"), s"sketch rollup needs no join:\n$p")
    assert(!p.contains("Window"), s"sketch rollup needs no window:\n$p")
  }

  test("q119 frame sample: per-partition sample-table walk, payloads never shuffle") {
    val p = planOf("q119_frame_sample")
    // the only exchange is the final presentation orderBy — the MP4
    // payloads are parsed and reduced to extent rows inside their
    // partition (MapPartitions), never shuffled whole
    assert(p.contains("MapPartitions"), s"expected MapPartitions decode:\n$p")
    val exchanges = "Exchange \\(\\d+\\)".r.findAllIn(p).length
    assert(exchanges <= 1, s"payloads must not shuffle, got $exchanges exchanges:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("generation-eval metrics: pure projections over one pair window — no join, two exchanges") {
    // BLEU/chrF/ROUGE-L/WER are per-pair scalars computed where the pair
    // row lives: the ONLY exchanges are the lead-window's hash partition
    // and the final orderBy's range partition. A join or a third
    // exchange here means the metric stopped being map-side.
    for (name <- Seq("q198_bleu", "q205_chrf", "q206_rouge_l", "q207_wer")) {
      val plan = planOf(name)
      assert(!plan.contains("Join"), s"$name plans a join:\n$plan")
      assert(!plan.contains("CartesianProduct"), name)
      // tree nodes render as "Exchange (<id>)"; the details section
      // repeats each as "(<id>) Exchange" — count tree nodes only
      val exchanges = "Exchange \\(".r.findAllIn(plan).size
      assert(exchanges <= 2, s"$name has $exchanges Exchange nodes (want <= 2):\n$plan")
    }
  }

  test("q200 corpus bleu: kernel stats partial-aggregate before the group shuffle") {
    val plan = planOf("q200_corpus_bleu")
    assert(!plan.contains("Join"), plan)
    // partial -> final hash aggregation: the per-pair longs combine
    // map-side, so the group shuffle moves ~10 longs per PARTITION,
    // not per pair
    assert(plan.contains("HashAggregate"), plan)
    assert("partial".r.findAllIn(plan.toLowerCase).nonEmpty, plan)
  }

  test("q208 eval rollup: four metrics in one stage — no join, three exchanges") {
    // bleu + chrf + rouge_l + wer compose as projections over the same
    // pair row: window hash partition, group aggregate, final sort —
    // and nothing else. A join here means a metric fell out of the
    // single-scan composition.
    val plan = planOf("q208_eval_rollup")
    assert(!plan.contains("Join"), s"rollup plans a join:\n$plan")
    val exchanges = "Exchange \\(".r.findAllIn(plan).size
    assert(exchanges <= 3, s"rollup has $exchanges Exchange nodes (want <= 3):\n$plan")
    assert(plan.contains("HashAggregate"), plan)
  }

  test("q218 multi-ref wer: map-side argmin over the pair window — no join") {
    // both references' edit-distance DPs run inside a row-local
    // transform; a join here means the per-ref scoring fell out of the
    // single-row composition (the rougeNMulti lesson)
    val plan = planOf("q218_wer_multi")
    assert(!plan.contains("Join"), s"q218 plans a join:\n$plan")
    val exchanges = "Exchange \\(".r.findAllIn(plan).size
    assert(exchanges <= 2, s"q218 has $exchanges Exchange nodes (want <= 2):\n$plan")
  }

  test("q217 sentence chunks: one generator stage — no join, no hash shuffle") {
    // chunking is a per-document kernel + posexplode; the only exchange
    // is the output sort's range partition
    val plan = planOf("q217_sentence_chunks")
    assert(!plan.contains("Join"), s"q217 plans a join:\n$plan")
    assert(!plan.contains("hashpartitioning"),
      s"q217 must not hash-shuffle the corpus:\n$plan")
  }

  test("q213 paired bootstrap: replicate draws partial-aggregate into a B-row shuffle; no cartesian corpus join") {
    // the corpus explodes B replicate weights map-side and combines
    // into a 200-row table BEFORE any shuffle; the only nested-loop
    // joins are the one-row scalar broadcasts (point estimate onto the
    // replicate aggregate, class stats onto pairs)
    val plan = planOf("q213_paired_bootstrap")
    assert(!plan.contains("CartesianProduct"), s"q213 cartesian:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"q213 must never shuffle-join the corpus:\n$plan")
    assert(plan.contains("HashAggregate"), plan)
    assert("partial".r.findAllIn(plan.toLowerCase).nonEmpty, plan)
  }

  test("q129 triangles: every join is an equi-join — no cartesian, no nested loop") {
    val p = planOf("q129_triangles")
    // the wedge self-join and the closure join key on (lo) / (y, z);
    // a cartesian here would be the classic all-pairs triangle mistake
    assert(!p.contains("CartesianProduct"), s"no cartesian in wedge mining:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"no nested-loop join:\n$p")
  }

  test("q130 dsir: bucket models join by broadcast — the corpus never shuffle-joins") {
    val df = SparkEntry.queries("q130_dsir_weights")(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    Caches.unpersistAll()
    // both ≤1024-row models and both 1-row totals broadcast into the
    // doc×bucket stream; the only corpus-sized exchanges are the two
    // hash aggregations (gram counts, doc score reduce) + final sort
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"model joins must broadcast, never shuffle the doc-bucket table:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast model joins:\n$p")
  }

  test("q223 binary eval: threshold prefix sums via the two-phase scan — no Window at all") {
    val p = planOf("q223_binary_eval")
    // a Window here would mean the distinct-score cumulative counts
    // regressed to a single-partition sort (the W1 hazard at every-
    // threshold scale); the two-phase scan hands off through an RDD
    assert(!p.contains("Window"), s"no window over the score thresholds:\n$p")
    assert(p.contains("Scan ExistingRDD"),
      s"expected the exclusivePrefixSum RDD handoff:\n$p")
  }

  test("q224/q225 sliced rank machinery: windows stay PARTITIONED — no single-partition exchange") {
    for (q <- Seq("q224_auc_by_source", "q225_spearman")) {
      val p = planOf(q)
      assert(!p.contains("Exchange SinglePartition"),
        s"$q: per-slice windows must never serialize through one partition:\n$p")
    }
  }

  test("q228 logreg: the gradient passes reuse the persisted feature projection") {
    val df = SparkEntry.queries("q228_logreg_gd")(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    Caches.unpersistAll()
    // the final-metrics scan must read the cached features (the same
    // cache the 5 gradient aggregates folded), not re-tokenize the
    // corpus; and nothing in the training surface joins the corpus
    assert(p.contains("InMemoryTableScan"),
      s"metrics must scan the persisted feature projection:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"no corpus-sized join anywhere in the model surface:\n$p")
  }

  test("q238 main content: the extraction UDF runs ONCE per row (own projection)") {
    val p = planOf("q238_main_content")
    val udfCount = "UDF".r.findAllMatchIn(p).size
    assert(udfCount == 1,
      s"expected exactly one extraction UDF site in the plan, found $udfCount:\n$p")
  }

  test("q239 gopher rules: scan prunes to (doc_id, text); no shuffle before the ORDER BY") {
    val p = planOf("q239_gopher_rules")
    val readSchema = "ReadSchema: struct<(.*?)>".r.findFirstMatchIn(p).map(_.group(1))
    assert(readSchema.exists(s => s.split(",").length <= 2 && s.contains("text")),
      s"rule pack should read only doc_id+text:\n$readSchema")
    // the only exchanges allowed are the final ORDER BY's range partition
    val exchanges = "Exchange (\\w+)".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(exchanges.forall(_.startsWith("rangepartitioning")),
      s"rule computation must be map-side (only the output sort may shuffle): $exchanges")
  }

  test("q240 host gate: ONE hash aggregate keyed on the host — no second corpus pass") {
    val p = planOf("q240_host_gate")
    val readSchema = "ReadSchema: struct<(.*?)>".r.findFirstMatchIn(p).map(_.group(1))
    assert(readSchema.exists(s => s.split(",").length <= 3 && s.contains("source")),
      s"host gate should read only doc_id+source+text:\n$readSchema")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"no join anywhere in the host gate:\n$p")
  }

  test("q133 cms: one 64 KB sketch broadcast, top-30 as TakeOrdered") {
    val df = SparkEntry.queries("q133_cms_freq")(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    Caches.unpersistAll()
    assert(p.contains("TakeOrderedAndProject"),
      s"top-30 must be a bounded heap, not a global sort:\n$p")
    assert(p.contains("ObjectHashAggregate"),
      s"the CMS build must plan as ObjectHashAggregate:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"the 1-row sketch joins by broadcast:\n$p")
  }
}
