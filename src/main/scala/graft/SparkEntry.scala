package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{GroupOps, Validation, ValidationRule}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator family from SURVEY.md §2 (or a
  * §7.4 LLM-pipeline extension), expressed through the graft library, run on
  * the driver-provided TPC-H-ish testdata. [[oracleSql]] carries the
  * DuckDB-equivalent SQL for the correctness gate; keys without SQL get the
  * weaker rows-only check (noted inline).
  *
  * Float parity with DuckDB: raw column passthrough is bit-exact; any
  * REaggregated double is wrapped in round(_, 2..6) so the two engines'
  * summation orders can't flip the hash.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-join star query: fact lineitem ⨝ orders ⨝ customer with broadcast
    * nation/region dims, revenue per nation.
    */
  def entry(spark: SparkSession): DataFrame =
    q03JoinRevenue(spark, "/root/testdata/sf0.001")

  // ------------------------------------------------------------------
  // Relational core (SURVEY.md §2.1–§2.10 operator inventory)
  // ------------------------------------------------------------------

  /** S1+C4+C7+A-agg: TPC-H Q1-style pricing summary. Filter reaches the
    * parquet scan (PushedFilters), aggregation is partial/final hash-agg.
    */
  private def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** C1–C5: filter + projection, pushed down to the scan (no full-width read). */
  private def q02FilterProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_quantity") > 45 && col("l_discount") < 0.05)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** J1-style star join: fact ⨝ orders ⨝ customer, broadcast dims. */
  private def q03JoinRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val ord = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    val nat = t(s, dir, "nation")
    val reg = t(s, dir, "region")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** J2-style left join + M3 coalesce: per-customer order stats incl. zero. */
  private def q04LeftJoinCounts(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val ord = t(s, dir, "orders")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("total_spent"))
      .orderBy(col("c_custkey"))
  }

  /** J5/C8 anti join: customers with no orders (the scrape-resume pattern). */
  private def q05AntiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.remaining(
        t(s, dir, "customer").withColumnRenamed("c_custkey", "k"),
        t(s, dir, "orders").withColumnRenamed("o_custkey", "k"), "k")
      .select(col("k").as("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Semi join: customers having at least one high-value order. */
  private def q06SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val big = t(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
      .select(col("o_custkey").as("c_custkey"))
    cust.join(big, Seq("c_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** W2/O2 top-k per group (k=1): each customer's largest order. */
  private def q07TopOrderPerCustomer(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"))
  }

  /** A1 group-mode with the pandas lexicographic tie-break (SURVEY §2.13.3). */
  private def q08GroupMode(s: SparkSession, dir: String): DataFrame =
    GroupOps.groupMode(t(s, dir, "orders"), Seq("o_custkey"), "o_orderpriority", "mode_priority")
      .orderBy(col("o_custkey"))

  /** A2 exact grouped median (pandas `median()` parity, SURVEY §2.13.4). */
  private def q09GroupedMedian(s: SparkSession, dir: String): DataFrame =
    GroupOps.groupedMedian(t(s, dir, "orders"), Seq("o_orderpriority"), "o_totalprice", "median_price")
      .select(col("o_orderpriority"), round(col("median_price"), 4).as("median_price"))
      .orderBy(col("o_orderpriority"))

  /** A3 multi-column distinct. */
  private def q10Distinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** U1 union-by-name across drifted schemas (null-fill, SURVEY §2.13.10). */
  private def q11UnionByName(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    val a = ord.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val b = ord.filter(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey"), col("o_totalprice"))
    GroupOps.unionByNameAll(Seq(a, b))
      .orderBy(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
  }

  /** E1 split-explode (the reference's affiliation explode). */
  private def q12ExplodeTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(explode(split(col("p_name"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("word"))

  /** F7/F8/F9 regex extract + flag + cast with null-on-no-match parity. */
  private def q13RegexExtract(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.CleanFunctions
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        CleanFunctions.positionNumber(col("o_orderpriority")).as("priority_num"),
        col("o_orderpriority").contains("URGENT").as("is_urgent"))
      .orderBy(col("o_orderkey"))
  }

  /** D1–D3 date parts + grouped agg. */
  private def q14DateParts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("month_total"))
      .orderBy(col("order_year"), col("order_month"))

  /** C6 conditional column (when/otherwise chains). */
  private def q15Conditional(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .withColumn("balance_bucket",
        when(col("c_acctbal") < 0, "negative")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("high"))
      .groupBy(col("c_mktsegment"), col("balance_bucket"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"), col("balance_bucket"))

  /** E2 wide pivot (explicit values keep the plan single-pass). */
  private def q16Pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(round(sum(col("l_quantity")), 2))
      .orderBy(col("l_linestatus"))

  /** A7 one-pass null-rate profile. */
  private def q17NullProfile(s: SparkSession, dir: String): DataFrame =
    GroupOps.nullProfile(t(s, dir, "events"))
      .select(col("column_name"), round(col("null_frac"), 6).as("null_frac"))
      .orderBy(col("column_name"))

  /** A9 duplicate detection (multiplicity > 1 groups). */
  private def q18Duplicates(s: SparkSession, dir: String): DataFrame =
    GroupOps.duplicateKeys(t(s, dir, "lineitem"), Seq("l_orderkey", "l_partkey"))
      .orderBy(col("l_orderkey"), col("l_partkey"))

  /** W1/W5 dense surrogate key at scale (no single-partition window). */
  private def q19DenseId(s: SparkSession, dir: String): DataFrame =
    GroupOps.denseId(
        t(s, dir, "orders").select(col("o_orderkey")),
        Seq(col("o_orderkey")), "order_sk")
      .orderBy(col("o_orderkey"))

  /** W4 forward-fill (the reference's results-page ffill). */
  private def q20Ffill(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .withColumn("v", when(col("event_type") === "error", lit(null).cast("double"))
        .otherwise(col("value")))
    GroupOps.ffill(ev, Seq("user_id"), Seq(col("ts"), col("event_id")), "v")
      .select(col("event_id"), col("user_id"), col("v").as("value_filled"))
      .orderBy(col("event_id"))
  }

  /** §2.10 validation engine: one-pass violation counts over declared rules. */
  private def q21Validation(s: SparkSession, dir: String): DataFrame = {
    val rules = Seq(
      ValidationRule("positive_price", col("o_totalprice") > 0),
      ValidationRule("valid_status", col("o_orderstatus").isin("O", "F", "P")),
      ValidationRule("priority_format", col("o_orderpriority").rlike("^[1-5]-")),
      ValidationRule("date_range",
        col("o_orderdate").between(lit("1992-01-01").cast("timestamp"), lit("1998-12-31").cast("timestamp"))),
      ValidationRule("high_value_urgent",
        !(col("o_totalprice") > 450000.0) || col("o_orderpriority").isin("1-URGENT", "2-HIGH")))
    Validation.violationCounts(t(s, dir, "orders"), rules)
  }

  // ------------------------------------------------------------------
  // LLM-data-pipeline extensions (SURVEY.md §7.4): dedup, similarity,
  // text analysis, JSON events, windowed time aggregation
  // ------------------------------------------------------------------

  /** Exact dedup groups by content fingerprint (md5 of normalized text). */
  private def q22DedupExact(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    Dedup.exactDedupGroups(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("fingerprint"))
  }

  /** Exact token-set Jaccard near-dup pairs (threshold 0.95, lang-blocked),
    * via equivalence-class collapse (the inverted-index variant
    * `Dedup.jaccardPairs` computes the identical set; see DedupSpec).
    */
  private def q23JaccardPairs(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    Dedup.jaccardPairsClassed(t(s, dir, "documents"), "doc_id", "text", "lang", 0.95)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** MinHash+LSH near-dup pairs with exact verification — same contract as
    * q23, so the DuckDB brute-force oracle checks LSH recall too
    * (banding auto-tuned from the threshold: 12 bands × 4 rows at 0.95,
    * P[miss | j≥0.95] < 2e-9 per pair — see Dedup.autoBanding).
    */
  private def q24MinhashLsh(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    Dedup.minhashDupPairsClassed(t(s, dir, "documents"), "doc_id", "text", "lang", 0.95)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** SimHash near-dup pairs (segmented candidate generation, exact Hamming
    * verify), on the engine-portable md5 token hash so the ORACLE can
    * rebuild the identical 64-bit signature (two 32-bit md5-prefix halves
    * — every intermediate fits a non-negative BIGINT in ANSI SQL) and
    * brute-force all pairs; segment blocking at maxDistance=3 has exact
    * recall (pigeonhole over 4 segments), so the sets must match
    * exactly. The xxhash64 kernel path stays the library scale default.
    */
  private def q25Simhash(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    Dedup.simhashDupPairsSegmented(t(s, dir, "documents"), "doc_id", "text", 3,
        portableHash = true)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Embedding near-dup pairs: cosine ≥ 0.35 over the full corpus, via
    * the exact IVF-blocked path (k-means-refined cells scaled to the
    * corpus, triangle-inequality cell-pair pruning, keyed shuffle join —
    * recall 1.0 guaranteed, no nested-loop cartesian; the all-pairs form
    * stays in the library for bounded pre-blocked sets). The achieved
    * pruned fraction is logged per run; on THIS corpus it is honestly 0
    * — the synthetic embeddings are directionally uniform, so exact
    * mining at 0.35 sits on the documented all-pairs floor — while the
    * clustered-corpus spec (SimilaritySpec) asserts the same code prunes
    * > 0.5 of cell pairs when duplicate families exist.
    */
  private def q26CosinePairs(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    Similarity.cosinePairsAboveBlocked(t(s, dir, "embeddings"), "vec_id", "embedding", 0.35)
      .select(col("id_a"), col("id_b"), round(col("cosine_sim"), 6).as("cosine_sim"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Brute-force cosine top-5 neighbours for a bounded query batch —
    * per-partition-heap scale path (window variant kept in the library;
    * spec asserts equality).
    */
  private def q27AnnTopK(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val emb = t(s, dir, "embeddings")
    Similarity.bruteForceTopKAtScale(emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbour_id"), round(col("cosine_sim"), 6).as("cosine_sim"))
      .orderBy(col("query_id"), col("neighbour_id"))
  }

  /** LSH-bucketed approximate top-k (the scale path), oracle-checked
    * against the EXACT top-k: at 64 tables × 4 planes the per-neighbour
    * miss probability is (1 − 0.582⁴)⁶⁴ ≈ 4e-4 even for the worst
    * neighbour in this corpus (cosine 0.255), and the hyperplanes are
    * seeded — so the LSH result deterministically equals the exact
    * result here, and the DuckDB exact-top-k SQL is a true end-to-end
    * recall gate (any recall regression breaks the hash match). The
    * ScalaTest suite separately checks recall at looser default params.
    */
  private def q28AnnLsh(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val emb = t(s, dir, "embeddings")
    // the at-scale form: single corpus pass + per-partition heaps;
    // output-identical to lshTopK (same planes, same candidates —
    // SimilaritySpec asserts row equality), no nTables× row blowup
    Similarity.lshTopKAtScale(emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding",
        k = 5, dim = 64, nTables = 64, nPlanes = 4)
      .select(col("query_id"), col("neighbour_id"), round(col("cosine_sim"), 6).as("cosine_sim"))
      .orderBy(col("query_id"), col("neighbour_id"))
  }

  /** Text quality + token statistics — ONE map-side pass: split once,
    * then the native [[graft.expressions.TextArrayStats]] kernel folds
    * all four statistics in a single JIT'd array scan (the per-stat
    * declarative columns each re-split the text and run their lambdas
    * interpreted — measured ~2.5× slower end-to-end at sf0.1).
    */
  private def q29TextStats(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions._
    graft.expressions.GraftFunctions.register(s)
    val stop = Seq("the", "a", "and", "of", "to")
    t(s, dir, "documents")
      .select(col("doc_id"), tokenStatsNative(col("text"), stop).as("st"))
      .select(
        col("doc_id"),
        col("st.n_tokens").as("n_tokens"),
        round(col("st.n_unique").cast("double") / col("st.n_tokens"), 6).as("uniq_ratio"),
        round(col("st.sum_token_len").cast("double") / col("st.n_tokens"), 6).as("avg_token_len"),
        round(col("st.n_stopwords").cast("double") / col("st.n_tokens"), 6).as("stopword_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Stopword-profile language scoring + argmax language ID (bulk path:
    * explode + one hash aggregate; see TextFunctions.langScoreTable).
    */
  private def q30LangId(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    TextFunctions.langScoreTable(t(s, dir, "documents"), "doc_id", "text")
      .select(col("id").as("doc_id"), col("en_hits"), col("de_hits"), col("pred_lang"))
      .orderBy(col("doc_id"))
  }

  /** Content fingerprint (md5 of normalized text) — engine-independent. */
  private def q31Fingerprint(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    t(s, dir, "documents").select(
      col("doc_id"),
      TextFunctions.contentFingerprint(col("text")).as("fingerprint"))
      .orderBy(col("doc_id"))
  }

  /** JSON property extraction from events.props (from_json → typed field). */
  private def q32JsonExtract(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType)))
    t(s, dir, "events")
      .withColumn("k", from_json(col("props"), schema).getField("k"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 4).as("avg_value"))
      .orderBy(col("k_mod"))
  }

  /** Tumbling 1-hour window aggregation over event time (batch form of the
    * Structured-Streaming window; same window() expression runs in both).
    */
  private def q33TumblingWindow(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.withEventTime(t(s, dir, "events"))
    ev.groupBy(window(col("event_time"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("w.start").cast("string").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
  }

  /** Sliding-window counts (1h window / 15m slide) — batch form of the
    * streaming sliding window; each event lands in 4 windows.
    */
  private def q34SlidingWindow(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.EventStreams
    EventStreams.slidingCounts(EventStreams.withEventTime(t(s, dir, "events")))
      .select(col("window_start").cast("string").as("window_start"), col("n_events"))
      .orderBy(col("window_start"))
  }

  /** Session windows per user (30-minute gap), batch form. Session start
    * reported as the raw ns epoch so both engines compare integers.
    */
  private def q35SessionWindow(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.EventStreams
    EventStreams.sessionCounts(EventStreams.withEventTime(t(s, dir, "events")))
      // µs granularity: DuckDB reads parquet TIMESTAMP(NANOS) at µs.
      // Integer div — double division is ±1µs lossy at epoch-ns scale.
      .withColumn("session_start_us", expr("session_start_ns div 1000"))
      .select(col("user_id"), col("session_start_us"), col("n_events"))
      .orderBy(col("user_id"), col("session_start_us"))
  }

  /** Multimodal plumbing: synthetic media → partition-wise decode →
    * feature extraction. Image rows decode REAL BMP pixel bytes, audio
    * rows REAL RIFF/WAVE PCM samples; only video uses the marked stub.
    * Oracle-checked: every synth payload is pure arithmetic in
    * media_id, so DuckDB reproduces every output column — metadata AND
    * the feature lane (cast to REAL where float rounding must match).
    */
  private def q36Multimodal(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val media = Multimodal.synthesize(s, 300)
    Multimodal.decodeFeatures(media, frameStride = 2).toDF()
      .select(col("mediaId").as("media_id"), col("modality"),
        col("decodedWidth").as("w"), col("decodedHeight").as("h"),
        col("nFramesSampled").as("frames_sampled"),
        round(element_at(col("feature"), 1).cast("double"), 4).as("f0"))
      .orderBy(col("media_id"))
  }

  // ------------------------------------------------------------------
  // Beyond-reference OLAP coverage (SURVEY.md §2.12 negative list):
  // grouping sets, distinct aggregates, global top-k
  // ------------------------------------------------------------------

  /** ROLLUP hierarchy totals (region → nation → grand total). */
  private def q37Rollup(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val nat = t(s, dir, "nation")
    val reg = t(s, dir, "region")
    cust.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"), round(sum(col("c_acctbal")), 2).as("total_balance"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** CUBE over two independent dimensions. */
  private def q38Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(avg(col("o_totalprice")), 2).as("avg_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** Distinct aggregates: exact count-distinct per group (plus the
    * mergeable approx_count_distinct HLL as the documented 100 TB path —
    * not in the oracle output since sketches aren't engine-portable).
    */
  private def q39CountDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** Global top-k (ORDER BY ... LIMIT k): TakeOrderedAndProject — a
    * per-partition heap + driver merge, no global sort of the table.
    */
  private def q40GlobalTopK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(20)

  /** As-of join (backward): each event gets the latest prior purchase
    * value of the same user — union-sort-ffill composition, one shuffle
    * (DuckDB native ASOF JOIN is the oracle). Ties (two purchases at the
    * same (user_id, ts)) break deterministically on max event_id; the
    * oracle mirrors that with an arg_max dedupe before its ASOF JOIN,
    * since DuckDB's ASOF itself leaves the tie pick undefined.
    */
  private def q41AsofJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TemporalJoins
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value").as("purchase_value"))
    TemporalJoins.asofBackward(ev, purchases, Seq("user_id"), "ts",
        Seq("purchase_value"), tieCol = Some("event_id"))
      .select(col("event_id"), col("user_id"),
        round(col("asof_purchase_value"), 4).as("last_purchase_value"))
      .orderBy(col("event_id"))
  }

  /** Range join (point-in-interval): lineitems shipped within 2 days of
    * each distinct order date — bucketed equi-join, not a nested loop.
    */
  private def q42RangeJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TemporalJoins
    val epoch = lit("1970-01-01").cast("date")
    val li = t(s, dir, "lineitem").select(
      datediff(col("l_shipdate").cast("date"), epoch).cast("long").as("ship_day"))
    val iv = t(s, dir, "orders")
      .select(col("o_orderdate").cast("date").as("order_date")).distinct()
      .withColumn("s", datediff(col("order_date"), epoch).cast("long"))
      .withColumn("e", col("s") + 2)
    TemporalJoins.pointInIntervalJoin(li, "ship_day", iv, "s", "e", bucketSize = 2L)
      .groupBy(col("order_date").cast("string").as("order_date"))
      .agg(count(lit(1)).as("n_shipped"))
      .orderBy(col("order_date"))
  }

  /** IVF coarse quantization: every vector assigned to its nearest of 8
    * centroid vectors (map-side argmax over the collected centroid array —
    * no shuffle, no row amplification), cell occupancy as output.
    */
  private def q43IvfAssign(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val emb = t(s, dir, "embeddings")
    val centroids = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    Similarity.ivfAssign(emb, "vec_id", "embedding", centroids, "cid", "cvec")
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vectors"))
      .orderBy(col("cell"))
  }

  /** n-gram (bigram-shingle) Jaccard near-dup pairs — sequence-sensitive,
    * unlike the token-set variant (q23): only genuinely near-identical
    * word SEQUENCES survive (threshold 0.5; the corpus separates cleanly:
    * true near-dups ≥ 0.96, everything else ≤ 0.13).
    */
  private def q44NgramJaccard(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    // the LSH-classed miner wins once signatures run on the native
    // codegen'd kernel (4.3s vs 4.8s at sf0.1 — the interpreted-HOF
    // signature cost that previously made brute-force-classed faster is
    // gone), and unlike the |classes|² merge-intersect it stays subquadratic
    // on a mostly-unique shingle corpus. Recall is exact here: qualifying
    // pairs sit at jaccard ≥ 0.96 (P[band miss] < 1e-16 at b=16, r=2), and
    // the brute-force DuckDB oracle verifies that every round.
    Dedup.minhashDupPairsClassed(t(s, dir, "documents"), "doc_id", "text", "lang", 0.5, ngram = 2)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Deterministic hash-split (train/val/test): membership is a pure
    * function of md5(doc_id) — same split on any cluster at any
    * parallelism, auditable by any engine with md5 (the oracle recomputes
    * it in DuckDB). Output: per-(split, lang) counts.
    */
  private def q45HashSplit(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.split(t(s, dir, "documents"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("split"), col("lang"))

  /** PII scrub over documents with deterministic synthetic PII appended
    * (the corpus itself is clean, so the scrub would be a no-op; the
    * injection makes redaction itself the thing under test). Output:
    * md5 of the scrubbed text + the audit count of emails seen — the
    * DuckDB oracle re-runs the identical RE2-compatible patterns.
    */
  private def q46PiiScrub(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PiiScrub
    val injected = t(s, dir, "documents").select(col("doc_id"),
      concat(col("text"),
        lit(" Contact user"), col("doc_id"), lit("@example.com or call +1 (555) 010-"),
        lpad(col("doc_id") % 10000, 4, "0"),
        lit(" from 192.168."), col("doc_id") % 256, lit(".17 today.")).as("text"))
    injected.select(col("doc_id"),
        md5(PiiScrub.scrub(col("text"))).as("scrubbed_md5"),
        PiiScrub.piiCount(col("text"), PiiScrub.EmailPattern).as("n_emails"))
      .orderBy(col("doc_id"))
  }

  /** Salted skew join: lineitem ⨝ orders with the fact side salted and
    * the dim side replicated 8× — the explicit mitigation for hot keys
    * that broadcast and AQE's skew split can't reach. Salting must not
    * change the result, and the oracle (a plain SQL join) proves it.
    */
  private def q47SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.SkewJoins
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_extendedprice"), col("l_discount"))
    val ord = t(s, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderpriority"))
    SkewJoins.saltedJoin(li, ord, Seq("k"), salt = 8)
      .groupBy(col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))
  }

  /** Stream-stream interval join, batch form (the unified-engine
    * contract: the identical expression runs micro-batched in
    * EventStreamsSpec; the oracle replays it as a plain SQL interval
    * join). Each purchase is attributed to the same user's views in the
    * preceding 30 minutes.
    */
  private def q48IntervalJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.EventStreams
    val ev = EventStreams.withEventTime(t(s, dir, "events"))
    EventStreams.purchaseAttribution(ev, "30 minutes")
      .select(col("purchase_id"), col("view_id"), col("user_id"),
        round(col("value"), 4).as("purchase_value"))
      .orderBy(col("purchase_id"), col("view_id"))
  }

  /** Connected-components closure over near-dup pairs → dedup clusters
    * with canonical keep-ids: the step that turns PAIR mining into an
    * actually deduplicated corpus (near-dup is not transitive; dedup
    * policy closes it). Label propagation — one keyed aggregation per
    * round, no driver-side graph; the DuckDB oracle recomputes the
    * closure with a recursive CTE over the same brute-force pair set.
    */
  private def q49DedupComponents(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.dedupClustersClassed(
        t(s, dir, "documents"), "doc_id", "text", "lang", 0.8)
      .select(col("keep_id"), col("cluster_size"),
        element_at(col("member_ids"), -1).as("max_member"))
      .orderBy(col("keep_id"))

  /** Overlapping token-window chunking (size 32, stride 16) — context-
    * window preparation for embedding/RAG pipelines. Pure map-side
    * generator; chunk text is md5'd in the output so the compare stays
    * narrow (DuckDB md5 = Spark md5 on identical strings).
    */
  private def q50ChunkDocuments(s: SparkSession, dir: String): DataFrame =
    graft.operators.Chunking.chunkTokens(
        t(s, dir, "documents").filter(col("doc_id") < 2000), "doc_id", "text", 32, 16)
      .select(col("doc_id"), col("chunk_id"),
        md5(col("chunk_text")).as("chunk_md5"), col("n_tokens"))
      .orderBy(col("doc_id"), col("chunk_id"))

  /** Bloom-prefiltered fact⨝dim join: the fact side is cut down by a
    * broadcast bloom over the filtered dim keys BEFORE the join shuffle;
    * false positives die in the exact join, so the oracle is the PLAIN
    * join — byte-identical results prove the prefilter is sound.
    */
  private def q51BloomJoin(s: SparkSession, dir: String): DataFrame = {
    val dim = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    val fact = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    // bloom sized from the dim side itself (a fixed expectedItems
    // saturates when the dim outgrows it — fpp → 1 at the 100× bench)
    graft.operators.PrefilterJoin.bloomJoin(fact, dim, "l_orderkey", "o_orderkey")
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("yr"))
  }

  /** Sketch-based approximate count-distinct with an accuracy contract:
    * the output CLAIMS |approx − exact| ≤ 3% per group at rsd = 1%
    * (3 standard errors; HLL++ is deterministic for fixed input, so the
    * claim is stable round to round), and the oracle — which recomputes
    * the exact counts and expects approx_ok = true — fails the round if
    * the sketch ever strays. Exact distinct shuffles every key; the
    * sketch is the 100 TB path (constant memory per group, mergeable
    * partials).
    */
  private def q52ApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    // exact and sketch in SEPARATE aggregations, joined on the (tiny)
    // group keys: combining countDistinct with a low-rsd HLL in one agg
    // makes the distinct-rewrite Expand drag the sketch's ~2^17-register
    // fixed-width buffer through a sort-based aggregate per expanded row
    // (measured 24.7 s vs 1.4 s split at sf0.1)
    val li = t(s, dir, "lineitem")
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n_exact"))
    val approx = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), rsd = 0.01).as("__approx"))
    exact.join(approx, "l_returnflag")
      .select(col("l_returnflag"), col("n_exact"),
        (abs(col("__approx") - col("n_exact")).cast("double") / col("n_exact") <= 0.03)
          .as("approx_ok"))
      .orderBy(col("l_returnflag"))
  }

  /** CDC latest-wins merge with tombstones: the events table split into
    * a base snapshot (even ids) and a changelog (odd ids), folded back
    * with [[graft.operators.Merge.applyChangelog]] — a user whose LATEST
    * event is an error is tombstoned out. One shuffle; deterministic
    * tie-break mirrored in the oracle's window.
    */
  private def q53CdcMerge(s: SparkSession, dir: String): DataFrame = {
    // withEventTime canonicalizes ts to epoch-ns Long whatever the file's
    // physical encoding — the `ts div 1000` below needs integer ns
    val ev = Tables.withEventTime(t(s, dir, "events"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val merged = graft.operators.Merge.applyChangelog(
      ev.filter(col("event_id") % 2 === 0), ev.filter(col("event_id") % 2 === 1),
      keys = Seq("user_id"), versionCol = "ts", tieBreak = "event_id",
      opCol = "event_type", deleteOp = "error")
    merged.select(col("user_id"),
        expr("ts div 1000").as("last_ts_us"),
        round(col("value"), 4).as("last_value"),
        col("event_type").as("last_type"))
      .orderBy(col("user_id"))
  }

  /** Z-order (Morton) clustering key: the data-layout primitive behind
    * two-column data skipping. The engine computes the interleave with a
    * pure codegen'd bit expression; the oracle recomputes it from SQL
    * GENERATED BY THE SAME LOOP ([[graft.operators.Layout.zValue2Sql]]),
    * so engine and oracle agree bit-for-bit on every row.
    */
  private def q54Zorder(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") < 3000)
      .select((col("l_orderkey") % 4096).cast("long").as("x"),
        (col("l_partkey") % 4096).cast("long").as("y"))
      .withColumn("z", graft.operators.Layout.zValue2(col("x"), col("y"), 12))
      .orderBy(col("z"), col("x"), col("y"))

  /** Unicode NFC canonicalization — decomposed sequences (e + combining
    * acute) and precomposed characters (é) must dedup/fingerprint as the
    * SAME text. Deterministic decomposed-unicode injection makes the
    * normalization itself the thing under test; DuckDB's nfc_normalize
    * implements the identical Unicode algorithm, so the md5s must match.
    * n_composed counts compositions (char-length delta).
    */
  private def q55NormalizeNfc(s: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(s)
    val injected = t(s, dir, "documents").select(col("doc_id"),
      concat(col("text"),
        lit(" cafe\u0301 u\u0308ni A\u030A end")).as("injected"))
    injected.select(col("doc_id"),
        md5(call_function("normalize_nfc", col("injected"))).as("norm_md5"),
        (length(col("injected")) - length(call_function("normalize_nfc", col("injected"))))
          .cast("long").as("n_composed"))
      .orderBy(col("doc_id"))
  }

  /** Sketch-based quantiles with an accuracy contract, same gate shape
    * as q52: the output CLAIMS the approx p50/p95 are within 1% relative
    * of the exact interpolated percentiles per group, and the oracle
    * recomputes the exact values (quantile_cont — the same definition as
    * Spark's `percentile`) and expects both claims true. The sketch
    * (mergeable KLL-style, bounded memory) is the 100 TB path; exact
    * percentile shuffles every value.
    */
  private def q56ApproxQuantiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      // BOTH percentiles per family in ONE aggregate buffer (array form):
      // separate calls each buffer/sort the column independently —
      // measured 2.1 s → 1.2 s warm at sf0.1 for the identical output
      .agg(
        expr("percentile(l_extendedprice, array(0.5, 0.95))").as("__p"),
        expr("percentile_approx(l_extendedprice, array(0.5, 0.95), 10000)").as("__a"))
      .select(col("l_returnflag"),
        element_at(col("__p"), 1).as("p50_exact"),
        element_at(col("__p"), 2).as("p95_exact"),
        element_at(col("__a"), 1).as("__a50"),
        element_at(col("__a"), 2).as("__a95"))
      .select(col("l_returnflag"),
        round(col("p50_exact"), 2).as("p50_exact"),
        round(col("p95_exact"), 2).as("p95_exact"),
        (abs(col("__a50") - col("p50_exact")) / col("p50_exact") <= 0.01).as("p50_ok"),
        (abs(col("__a95") - col("p95_exact")) / col("p95_exact") <= 0.01).as("p95_ok"))
      .orderBy(col("l_returnflag"))

  /** BM25 relevance over the documents corpus for a fixed term bag — the
    * ranking primitive for query-targeted corpus extraction. The heavy
    * side (per-doc tf) is pruned to query terms before any shuffle;
    * document frequency and corpus stats are broadcast (see
    * [[graft.operators.Scoring]] for the 100 TB shape). The oracle
    * recomputes the identical formula in SQL — idf, length norm and all.
    */
  private def q57Bm25(s: SparkSession, dir: String): DataFrame =
    graft.operators.Scoring.bm25(t(s, dir, "documents"), "doc_id", "text",
        Seq("vector", "stream", "window"))
      .select(col("doc_id"), col("n_matched"), round(col("score"), 6).as("score"))
      .orderBy(col("doc_id"))

  /** Symmetric int8 embedding quantization report — the 4× compression
    * pass before a vector corpus enters an ANN index. Pure map-side array
    * expressions (no UDF, no shuffle); the codes are pinned by (sum, L1)
    * and the dequantization error bound is part of the output contract.
    */
  private def q58QuantizeInt8(s: SparkSession, dir: String): DataFrame =
    graft.operators.Quantize.quantizeReport(t(s, dir, "embeddings"), "vec_id", "embedding")
      .select(col("vec_id"), round(col("scale"), 6).as("scale"),
        col("q_sum"), col("q_l1"), round(col("max_err"), 6).as("max_err"))
      .orderBy(col("vec_id"))

  /** Concat-then-split context-window packing (budget 512) over the
    * documents corpus in doc_id order — the LLM pretraining batcher. The
    * global token prefix sum uses the two-phase scan, NOT a single-
    * partition window ([[graft.operators.Packing]]); the oracle computes
    * the same offsets with a windowed SUM (fine at oracle scale).
    */
  private def q59PackConcat(s: SparkSession, dir: String): DataFrame =
    graft.operators.Packing.packConcat(t(s, dir, "documents"), "doc_id", "text", 512)
      .select(col("doc_id"), col("n_tokens"), col("start_off"), col("bin"),
        col("bins_spanned"))
      .orderBy(col("doc_id"))

  /** Train/test contamination audit: near-dup pairs (MinHash-LSH classed
    * miner — the 100 TB path, recall-verified by q24) that STRADDLE the
    * deterministic hash split of q45 — the leakage check every training
    * pipeline needs before shipping an eval set. The oracle recomputes
    * the brute-force Jaccard pair set and the split labels independently.
    */
  private def q60Contamination(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Dedup, Sampling}
    val docs = t(s, dir, "documents")
    val pairs = Dedup.minhashDupPairsClassed(docs, "doc_id", "text", "lang", 0.95)
    val splits = docs.select(col("doc_id"),
      Sampling.splitLabel(col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
    pairs
      .join(splits.withColumnsRenamed(Map("doc_id" -> "id_a", "split" -> "split_a")), "id_a")
      .join(splits.withColumnsRenamed(Map("doc_id" -> "id_b", "split" -> "split_b")), "id_b")
      .filter(col("split_a") =!= col("split_b"))
      .select(col("id_a"), col("id_b"), col("split_a"), col("split_b"),
        round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Hot-key-only salted join: a sampling pre-pass finds keys whose rows
    * would dominate a shuffle partition and salts ONLY those —
    * replication cost scales with the number of hot keys, not the whole
    * dim side (q47 is the salt-everything form). The threshold is
    * partition-relative (`hotKeySaltedJoinAuto`): an absolute one
    * classified every key hot at the 100× bench and salted the whole
    * join. On this uniform corpus nothing is hot at any scale, so the
    * measured cost is detection + the plain join; the salted path's
    * detection and result-invariance are pinned by SkewJoinsSpec on a
    * skewed corpus. The oracle is the plain join: salting must never
    * change the result.
    */
  private def q61HotkeySalt(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_suppkey").as("k"), col("l_extendedprice"), col("l_discount"))
    val sup = t(s, dir, "supplier").select(col("s_suppkey").as("k"), col("s_name"))
    graft.operators.SkewJoins.hotKeySaltedJoinAuto(li, sup, Seq("k"),
        salt = 4, sampleFraction = 0.2)
      .groupBy(col("s_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("s_name"))
  }

  /** Per-source document cap (≤ 40 docs per source, deterministic
    * md5-order selection) — the corpus rebalancing step that stops one
    * domain from dominating a training mix. Fixed-size counterpart of
    * q45's fixed-fraction split; same portable-hash contract, so the
    * oracle reselects the identical rows.
    */
  private def q62SourceCap(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.capPerGroup(t(s, dir, "documents"), "source", "doc_id", 40)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_sum"))
      .orderBy(col("source"))

  /** Incremental aggregate maintenance: orders history is aggregated to
    * partial form (sum/cnt/min/max), a later delta batch is folded in by
    * the monoid merge, and avg is derived at read time — O(delta)
    * instead of O(history) per refresh. The oracle recomputes the same
    * aggregate from the FULL table in one pass: the merged result must
    * be indistinguishable from a cold recompute.
    */
  private def q63IncrementalAgg(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Incremental
    val ord = t(s, dir, "orders")
    val cut = to_date(lit("1997-01-01"))
    val snapshot = Incremental.partialAgg(
      ord.filter(col("o_orderdate") < cut), Seq("o_orderpriority"), Seq("o_totalprice"))
    val delta = Incremental.partialAgg(
      ord.filter(col("o_orderdate") >= cut), Seq("o_orderpriority"), Seq("o_totalprice"))
    val merged = Incremental.withAvg(
      Incremental.mergeAdditive(snapshot, delta, Seq("o_orderpriority"), Seq("o_totalprice")),
      Seq("o_totalprice"))
    merged.select(col("o_orderpriority"), col("n_rows"),
        round(col("o_totalprice_sum"), 2).as("price_sum"),
        col("o_totalprice_cnt").as("price_cnt"),
        round(col("o_totalprice_min"), 2).as("price_min"),
        round(col("o_totalprice_max"), 2).as("price_max"),
        round(col("o_totalprice_avg"), 4).as("price_avg"))
      .orderBy(col("o_orderpriority"))
  }

  /** Gopher-style repetition profile over the documents corpus: top- and
    * duplicate-bigram mass per document — the quality heuristic that
    * catches boilerplate and degenerate text that per-token stats (q29)
    * can't see. Exact long/long fractions, so the oracle divides the
    * same integers.
    */
  private def q64Repetition(s: SparkSession, dir: String): DataFrame =
    graft.functions.TextFunctions.repetitionStats(t(s, dir, "documents"), "doc_id", "text", 2)
      .select(col("doc_id"), col("n_grams"),
        round(col("top_frac"), 6).as("top_frac"),
        round(col("dup_frac"), 6).as("dup_frac"))
      .orderBy(col("doc_id"))

  /** C4-style corpus-wide span dedup: every 8-token span that occurs
    * anywhere else in the corpus keeps only its global first occurrence;
    * documents are rebuilt from surviving spans. Output pins the rebuilt
    * text by md5; the oracle replays the identical selection in SQL.
    */
  private def q65SpanDedup(s: SparkSession, dir: String): DataFrame =
    graft.operators.Chunking.spanDedup(t(s, dir, "documents"), "doc_id", "text", 8)
      .select(col("doc_id"), col("n_kept"), col("n_dropped"),
        md5(col("text")).as("text_md5"))
      .orderBy(col("doc_id"))

  /** One Lloyd k-means update step over the embeddings (cosine
    * assignment to the q43 seed centroids, then per-cell per-dimension
    * mean) — the training loop behind the IVF index q43/q28 consume.
    * The per-dim aggregation explodes (vector, dim) but partial hash
    * aggregation collapses each partition to k·d rows before the
    * shuffle — the 100 TB shape for centroid updates. The oracle
    * recomputes assignment AND means positionally in SQL.
    */
  private def q66KmeansStep(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val emb = t(s, dir, "embeddings")
    val centroids = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val assigned = Similarity.ivfAssign(emb, "vec_id", "embedding", centroids, "cid", "cvec")
    val dims = assigned.select(col("cell"), posexplode(col("embedding")))
      .groupBy(col("cell"), col("pos"))
      .agg(avg(col("col").cast("double")).as("m"))
    val stats = dims.groupBy(col("cell"))
      .agg(round(sqrt(sum(col("m") * col("m"))), 6).as("centroid_norm"),
        round(sum(col("m")), 6).as("centroid_sum"))
    assigned.groupBy(col("cell")).agg(count(lit(1)).as("n_members"))
      .join(stats, "cell")
      .orderBy(col("cell"))
  }

  /** Exact quantile binning (ntile-4 by price) WITHOUT the single-
    * partition window `ntile` plans: the global rank comes from the
    * two-phase scan ([[graft.operators.GroupOps.denseId]]) and the
    * standard ntile group arithmetic is applied in closed form — same
    * output as `ntile(4) OVER (ORDER BY ...)`, which is exactly what the
    * oracle runs (fine at oracle scale, driver-melting at 100 TB).
    */
  private def q67QuantileBuckets(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.GroupOps
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    GroupOps.ntileBuckets(li,
        Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")), 4, "bucket")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        round(min(col("l_extendedprice")), 2).as("price_min"),
        round(max(col("l_extendedprice")), 2).as("price_max"),
        round(sum(col("l_extendedprice")), 2).as("price_sum"))
      .orderBy(col("bucket"))
  }

  /** The full corpus-curation funnel (language → quality → dedup →
    * split) run end-to-end with per-stage survivor counts — the proof
    * that the individually-oracled curation operators COMPOSE. The
    * oracle rebuilds the entire funnel independently in SQL.
    */
  private def q68CurationFunnel(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.CorpusCuration.funnel(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("stage"))

  /** Set operations (INTERSECT / EXCEPT — §2.12 negative coverage made
    * positive): customers active in both 1996 and 1997 vs active in 1996
    * only. Both plan as joins over distinct sets (left-semi / left-anti),
    * not row comparisons — the shuffle is on the already-distinct keys.
    */
  private def q69SetOps(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    def activeIn(year: Int) = ord
      .filter(col("o_orderdate") >= to_date(lit(s"$year-01-01")) &&
        col("o_orderdate") < to_date(lit(s"${year + 1}-01-01")))
      .select(col("o_custkey"))
    val both = activeIn(1996).intersect(activeIn(1997))
      .withColumn("set_op", lit("both_years"))
    val onlyFirst = activeIn(1996).except(activeIn(1997))
      .withColumn("set_op", lit("only_1996"))
    both.unionByName(onlyFirst)
      .groupBy(col("set_op"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("set_op"))
  }

  /** Quality-weighted deterministic downsampling: every document
    * survives with probability n_chars / max(n_chars) — longer (proxy:
    * higher-value) docs are kept preferentially, and the decision is a
    * pure hash function of the id so the oracle recomputes membership
    * row by row. Map-side except the 1-row max broadcast.
    */
  private def q70WeightedSample(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val mx = docs.agg(max(col("n_chars")).as("__mx"))
    graft.operators.Sampling.weightedSample(
        docs.crossJoin(broadcast(mx)), "doc_id",
        col("n_chars").cast("double") / col("__mx"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_sum"))
      .orderBy(col("lang"))
  }

  /** URL canonicalization: two deterministically mangled spellings of
    * the same page per document (case-shuffled host, tracking params,
    * fragment, trailing slash) must normalize to the SAME canonical URL
    * — the prerequisite for page-level dedup keyed on URLs. The oracle
    * re-runs the identical normalization chain in SQL and checks both
    * the canonical md5 and the a==b collapse per row.
    */
  private def q71UrlNormalize(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.normalizeUrl
    val raw = t(s, dir, "documents").select(col("doc_id"),
      concat(lit("HTTPS://Example.COM/docs/"), col("doc_id"),
        lit("/?utm_source=feed&ref=rss#top")).as("__a"),
      concat(lit("https://example.com/docs/"), col("doc_id")).as("__b"))
    raw.select(col("doc_id"),
        md5(normalizeUrl(col("__a"))).as("norm_md5"),
        (normalizeUrl(col("__a")) === normalizeUrl(col("__b"))).as("canonical_match"))
      .orderBy(col("doc_id"))
  }

  /** Vocabulary induction: the global token table (collection frequency
    * + document frequency), top-100 by tf — tokenizer-vocab / stop-word
    * discovery over the corpus. One explode + one partial-aggregated
    * hash agg; the top-k is a TakeOrderedAndProject, never a global
    * sort. Deterministic tie-break on the token itself.
    */
  private def q72VocabTopk(s: SparkSession, dir: String): DataFrame =
    graft.operators.Scoring.vocabTable(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(desc("tf"), asc("token"))
      .limit(100)

  /** TF-IDF feature weights over the whole vocabulary, projected to a
    * bounded doc slice for the compare (the OPERATOR runs corpus-wide —
    * N and df come from all documents; the filter only trims the
    * output). Oracle restates the full formula in SQL.
    */
  private def q73TfIdf(s: SparkSession, dir: String): DataFrame =
    graft.operators.Scoring.tfIdf(t(s, dir, "documents"), "doc_id", "text")
      .filter(col("doc_id") < 20 && col("term") =!= "")
      .select(col("doc_id"), col("term"), col("tf"),
        round(col("tf_idf"), 6).as("tf_idf"))
      .orderBy(col("doc_id"), col("term"))

  /** n-gram-level eval decontamination: train-split documents sharing
    * at least one 8-gram with any test-split document (GPT-3-style
    * "13-gram" decontamination, scaled to this corpus's doc lengths).
    * q60 audits DOC-level near-dup leakage; this catches partial
    * inclusion — an eval example quoted inside a long training doc.
    * The oracle rebuilds the split and the n-gram overlap from strings
    * (the engine joins on xxhash64 gram hashes — same doc set modulo
    * ~1e-16 collisions).
    */
  private def q74NgramDecontaminate(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Dedup, Sampling}
    val labeled = t(s, dir, "documents").withColumn("split",
      Sampling.splitLabel(col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
    Dedup.ngramContamination(
        labeled.filter(col("split") === "train"),
        labeled.filter(col("split") === "test"),
        "doc_id", "text", 8)
      .select(col("id").as("doc_id"), col("n_shared"))
      .orderBy(col("doc_id"))
  }

  /** Bigram PMI collocation mining: adjacent token pairs scored by
    * pointwise mutual information (count floor 5), top-100. Bigrams are
    * generated map-side per token array (no token-table self-join); the
    * counts aggregate to vocabulary size before any join. Determinism:
    * (pmi desc, word_a, word_b) full tie-break at the limit boundary.
    */
  private def q75PmiCollocations(s: SparkSession, dir: String): DataFrame =
    graft.operators.Scoring.pmiCollocations(t(s, dir, "documents"), "text", minCount = 5)
      .select(col("word_a"), col("word_b"), col("c_ab"), round(col("pmi"), 6).as("pmi"))
      .orderBy(desc("pmi"), col("word_a"), col("word_b"))
      .limit(100)

  /** Per-event trailing 1-hour rolling aggregates (count/sum/avg of the
    * same user's events) — one key-partitioned RANGE window over
    * event-time seconds, no self-join. Ties (same truncated second) are
    * frame peers, so the values are deterministic under any physical
    * row order.
    */
  private def q76RollingWindow(s: SparkSession, dir: String): DataFrame =
    graft.operators.Rolling.trailingAgg(
        graft.sources.Tables.withEventTime(t(s, dir, "events")),
        "user_id", "event_time", "value", 3600)
      .select(col("event_id"), col("user_id"), col("roll_count"),
        round(col("roll_sum"), 4).as("roll_sum"), round(col("roll_avg"), 6).as("roll_avg"))
      .orderBy(col("event_id"))

  /** SCD2 dimension history from the orders changelog: one validity
    * interval per ACTUAL priority change per customer (consecutive
    * same-priority orders collapse), `valid_to` = next version's start,
    * null while current. One shuffle on the key; both windows share it.
    */
  private def q77Scd2(s: SparkSession, dir: String): DataFrame =
    graft.operators.Merge.scd2(t(s, dir, "orders"),
        keys = Seq("o_custkey"), tsCol = "o_orderdate",
        tieBreak = "o_orderkey", tracked = Seq("o_orderpriority"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderpriority"),
        col("valid_from"), col("valid_to"), col("is_current"))
      .orderBy(col("o_custkey"), col("valid_from"), col("o_orderkey"))

  /** Model-based quality scoring: fixed-weight logistic model over the
    * one-pass token-stats kernel (log tokens, unique ratio, mean token
    * length, stopword ratio) — pure map-side inference, zero shuffle.
    * The oracle recomputes the full feature vector and the sigmoid.
    */
  private def q78QualityModel(s: SparkSession, dir: String): DataFrame =
    graft.functions.TextFunctions.qualityModelTable(t(s, dir, "documents"),
        "doc_id", "text", stopwords = Seq("the", "a", "and", "of", "to"))
      .select(col("doc_id"), round(col("score"), 6).as("score"), col("keep"))
      .orderBy(col("doc_id"))

  /** Per-document token-distribution Shannon entropy (bits) via the
    * fused n-gram kernel's Σc·ln c — the information-density quality
    * signal; map-side, zero shuffle (the declarative two-agg form is
    * the kernel's executable spec and the oracle's formulation).
    */
  private def q79TokenEntropy(s: SparkSession, dir: String): DataFrame =
    graft.functions.TextFunctions.tokenEntropyTable(t(s, dir, "documents"), "doc_id", "text")
      .select(col("doc_id"), col("n_grams"), round(col("entropy_bits"), 6).as("entropy_bits"))
      .orderBy(col("doc_id"))

  /** Per-group winsorization: prices clipped into the group's exact
    * [p05, p95] band (SQL-standard interpolated percentiles — same
    * semantics DuckDB's quantile_cont implements); bounded group table
    * broadcast back, map-side clip.
    */
  private def q80Winsorize(s: SparkSession, dir: String): DataFrame =
    graft.operators.GroupOps.winsorize(t(s, dir, "lineitem"),
        Seq("l_returnflag"), "l_extendedprice", "price_w")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        round(col("price_w"), 2).as("price_w"), col("price_w_clipped"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Distribution shift between two corpus slices: smoothed KL
    * divergence D(en‖de) over token distributions — the admit-gate
    * statistic for new data sources. One explode + vocabulary-sized
    * aggregate; the corpus moves once.
    */
  private def q81KlDivergence(s: SparkSession, dir: String): DataFrame =
    graft.operators.Scoring.tokenKlDivergence(t(s, dir, "documents"),
        "lang", "text", pSlice = "en", qSlice = "de")
      .select(col("p_slice"), col("q_slice"),
        round(col("kl_divergence"), 6).as("kl_divergence"),
        col("p_tokens"), col("q_tokens"))

  /** Bivariate statistics per group (corr / covar_samp / stddev_samp /
    * var_samp) — the built-in one-pass co-moment aggregates, partial
    * (map-side) combined like any hash agg.
    */
  private def q82CorrStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_covar"),
        round(stddev_samp(col("l_extendedprice")), 4).as("price_stddev"),
        round(var_samp(col("l_quantity")), 4).as("qty_var"))
      .orderBy(col("l_returnflag"))

  /** Exact top-10 frequent tokens via the Misra–Gries heavy-hitters
    * sketch (two passes: mergeable-sketch candidates, exact re-count of
    * the survivors) — oracle = the plain exact top-k, which MUST match
    * because the k-th count clears the N/(capacity+1) survival bar
    * (capacity 256 ≫ the corpus vocabulary here, so the sketch is
    * lossless; the operator contract documents the general bound).
    */
  private def q83HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
    graft.operators.Scoring.heavyHitters(toks, "token", k = 10, capacity = 256)
  }

  /** Conversion funnel view → click → purchase: users whose greedy
    * event chain reaches each stage (strictly increasing event time).
    * One shuffle on the user key + a sorted per-user fold — no k-way
    * self-join. The oracle chains strict-min subqueries per stage.
    */
  private def q84Funnel(s: SparkSession, dir: String): DataFrame = {
    val steps = Seq("view", "click", "purchase")
    val events = graft.sources.Tables.withEventTime(t(s, dir, "events"))
    graft.operators.Funnel.conversionFunnel(
        events, "user_id", "event_time", "event_type", steps)
      .orderBy(col("step"))
  }

  /** Funnel per-user state audit, run by Bench OUTSIDE q84's timed
    * region (an extra shuffle+aggregate inside the timing skewed
    * cross-round q84 comparisons): the `maxEventsPerUser=1M` guard is
    * sized from a MEASURED high-water mark at every bench scale point,
    * so a scale-up that erodes the headroom shows up in the log, not as
    * a surprise raise_error three decades later.
    */
  def funnelStateAudit(s: SparkSession, dir: String): Unit = {
    val steps = Seq("view", "click", "purchase")
    val events = graft.sources.Tables.withEventTime(t(s, dir, "events"))
    val hw = graft.operators.Funnel
      .stateHighWater(events, "user_id", "event_type", steps).head()
    // with zero step events the global max aggregates to NULL, which
    // getAs[Long] unboxes to 0 — guard it rather than log headroom=∞
    val max = hw.getAs[Long]("max_events_per_user")
    if (hw.isNullAt(hw.fieldIndex("max_events_per_user")) || max == 0L)
      println("[q84] funnel per-user state high-water: no step events")
    else
      println(f"[q84] funnel per-user state high-water: max=$max%d " +
        f"p99=${hw.getAs[Double]("p99_events_per_user")}%.0f " +
        f"mean=${hw.getAs[Double]("mean_events_per_user")}%.1f " +
        f"headroom=${1000000.0 / max}%.0fx vs maxEventsPerUser=1000000")
  }

  /** Typo-level fuzzy self-join over part names: all pairs within
    * Levenshtein distance 2, via deletion-neighborhood (SymSpell)
    * blocking + exact verify — never the all-pairs cross join the
    * oracle brute-forces.
    */
  private def q85EditDistancePairs(s: SparkSession, dir: String): DataFrame =
    graft.operators.FuzzyJoin.editDistancePairs(
        t(s, dir, "part").select(col("p_name")).distinct(),
        "p_name", "p_name", maxDist = 2)
      .select(col("id_a").as("name_a"), col("id_b").as("name_b"), col("dist"))
      .orderBy(col("name_a"), col("name_b"))

  /** Unpivot/melt (wide → long): lineitem's numeric measures to
    * (key, measure, value) rows — the reshape dual of q16's pivot,
    * via the native `unpivot` (an Expand node: map-side row
    * generation, zero shuffle beyond the output sort).
    */
  private def q86Unpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("double").as("l_quantity"),
        col("l_extendedprice").cast("double").as("l_extendedprice"),
        col("l_discount").cast("double").as("l_discount"))
      .unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        variableColumnName = "measure", valueColumnName = "value")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"))

  /** The analytic rank-window family in one pass: rank / dense_rank /
    * percent_rank / cume_dist / lag / lead over (customer, order date)
    * — one key shuffle, every function sharing the same window sort.
    */
  private def q87RankFamily(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        round(percent_rank().over(w), 6).as("prnk"),
        round(cume_dist().over(w), 6).as("cdist"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Calendar feature extraction (§2.8 date surface, widened): the
    * standard date-dimension columns in one map-side pass. Day-of-week
    * is normalized to ISO (1=Monday) — the one convention both engines
    * can express exactly.
    */
  private def q88DateFeatures(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"),
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        // Spark dayofweek: 1=Sunday → ISO 1=Monday
        ((dayofweek(col("o_orderdate")) + 5) % 7 + 1).as("iso_dow"),
        dayofyear(col("o_orderdate")).as("doy"),
        weekofyear(col("o_orderdate")).as("iso_week"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        last_day(col("o_orderdate")).as("month_end"),
        datediff(to_date(lit("1998-12-31")), col("o_orderdate")).as("days_to_eoy"))
      .orderBy(col("o_orderkey"))

  /** Johnson–Lindenstrauss random projection 64→16 dims with the
    * deterministic md5-parity sign matrix — map-side fold per row,
    * zero shuffle; the oracle rebuilds the identical matrix in SQL and
    * recomputes every dot product through the (dIn·dOut)-exploded
    * join form this operator exists to avoid.
    */
  private def q89RandomProjection(s: SparkSession, dir: String): DataFrame =
    graft.operators.Projection.randomProject(
        t(s, dir, "embeddings"), "embedding", dIn = 64, dOut = 16, out = "proj")
      .select(col("vec_id"), posexplode(col("proj")))
      .select(col("vec_id"), col("pos").as("j"), round(col("col"), 6).as("p"))
      .orderBy(col("vec_id"), col("j"))

  /** IVF cell-probed top-k — the third ANN path next to exact heaps
    * (q27) and LSH buckets (q28). Codebook = the 16 lowest-id vectors
    * (deterministic, engine-reproducible); probing ALL 16 cells makes
    * the approximate path deterministically exact, so the q27-style
    * exact-top-k oracle doubles as an end-to-end gate on the whole
    * cell-partition → probe → join → re-rank machinery (q28
    * precedent). Partial-probe recall (≈0.93 at nProbe=8 here — this
    * corpus has weak cosine cluster structure) is asserted separately
    * in SimilaritySpec.
    */
  private def q90IvfTopK(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val emb = t(s, dir, "embeddings")
    val codebook = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    Similarity.ivfTopK(emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding",
        codebook, "cid", "cvec", k = 5, nProbe = 16)
      .select(col("query_id"), col("neighbour_id"),
        round(col("cosine_sim"), 6).as("cosine_sim"))
      .orderBy(col("query_id"), col("neighbour_id"))
  }

  /** ANALYZE-style table profile of orders: one aggregate pass melted
    * to a row per column (rows / nulls / distinct / min / max,
    * string-rendered). Oracle recomputes each column's stats
    * independently. Distinct counts ride tableProfile's default size
    * gate (exact under 10M rows, HLL past it — the Components-style
    * hybrid): every oracle/bench scale here is far under the gate, so
    * the oracle's exact COUNT(DISTINCT) matches by construction; a
    * deployment profiling >10M-row tables against an exact oracle must
    * pin `exactDistinctMaxRows = Long.MaxValue`.
    */
  private def q91TableProfile(s: SparkSession, dir: String): DataFrame =
    graft.operators.GroupOps.tableProfile(t(s, dir, "orders"))
      .orderBy(col("column_name"))

  /** Full outer join (§2.3 completed): per-customer 1996 vs 1997 spend
    * side by side — customers active in only one year keep a null on
    * the other side; the USING key coalesces.
    */
  private def q92FullOuter(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    def spend(year: Int, out: String) = ord
      .filter(col("o_orderdate") >= to_date(lit(s"$year-01-01")) &&
        col("o_orderdate") < to_date(lit(s"${year + 1}-01-01")))
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as(out))
    spend(1996, "spend_96")
      .join(spend(1997, "spend_97"), Seq("o_custkey"), "full_outer")
      .orderBy(col("o_custkey"))
  }

  /** Forward as-of join (merge_asof direction='forward'): every event
    * attaches the user's NEXT purchase value at-or-after it — the
    * mirror scan of q41's backward join, same one-shuffle shape. Tie
    * dedup mirrors too: first event_id per equal timestamp.
    */
  private def q93AsofForward(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TemporalJoins
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value").as("purchase_value"))
    TemporalJoins.asofForward(ev, purchases, Seq("user_id"), "ts",
        Seq("purchase_value"), tieCol = Some("event_id"))
      .select(col("event_id"), col("user_id"),
        round(col("asof_purchase_value"), 4).as("next_purchase_value"))
      .orderBy(col("event_id"))
  }

  /** Nearest as-of join (merge_asof direction='nearest'): the closer of
    * the previous and next purchase by absolute time distance, equal
    * distance breaking backward — one shuffle, two in-partition scans.
    * The oracle composes DuckDB's backward and forward ASOF joins with
    * the identical pick rule.
    */
  private def q94AsofNearest(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TemporalJoins
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value").as("purchase_value"))
    TemporalJoins.asofNearest(ev, purchases, Seq("user_id"), "ts",
        Seq("purchase_value"), tieCol = Some("event_id"))
      .select(col("event_id"), col("user_id"),
        round(col("asof_purchase_value"), 4).as("nearest_purchase_value"))
      .orderBy(col("event_id"))
  }

  /** Duplicate-cluster retention: q49's near-dup clusters resolved by a
    * KEEP-LONGEST policy (arg-max n_chars, low-id tie-break) instead of
    * the arbitrary min-id — the "which duplicate survives" decision a
    * real curation pipeline makes. The oracle re-closes the clusters
    * with the recursive CTE and re-picks with the same policy.
    */
  private def q95ClusterResolve(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    val docs = t(s, dir, "documents")
    val clusters = Dedup.dedupClustersClassed(docs, "doc_id", "text", "lang", 0.8)
    Dedup.resolveClusters(clusters,
        docs.select(col("doc_id"), col("n_chars").cast("double").as("score")),
        "doc_id", "score")
      .orderBy(col("cluster_id"))
  }

  /** Exact stratified split: per-language 80/10/10 with boundaries at
    * floor(cumfrac·n) over a deterministic md5 rank — proportions exact
    * per stratum, unlike the binomial per-row hash split (q45). Output
    * aggregates membership (count + id-sum) per (lang, split).
    */
  private def q96StratifiedSplit(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.stratifiedSplit(t(s, dir, "documents"), "doc_id", "lang",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
      .orderBy(col("lang"), col("split"))

  /** Snapshot diff: per-customer 1996 vs 1997 order aggregates
    * classified added / removed / changed / unchanged — the audit
    * primitive behind "what did this run change" (ship `added ∪
    * changed` only). Null-safe compare; one full-outer join on the key.
    */
  private def q97SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    def snap(year: Int) = ord
      .filter(col("o_orderdate") >= to_date(lit(s"$year-01-01")) &&
        col("o_orderdate") < to_date(lit(s"${year + 1}-01-01")))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("spend"))
    graft.operators.Merge.snapshotDiff(snap(1996), snap(1997),
        keys = Seq("o_custkey"), tracked = Seq("n_orders", "spend"))
      .orderBy(col("o_custkey"))
  }

  /** Gap-filled resample: per-user 6-hour event buckets DENSIFIED over
    * each user's [first, last] span — empty buckets appear with
    * n_events = 0 and the last observed sum carried forward
    * (`filled_sum`), the regular-grid contract windowed GROUP BY (q33)
    * cannot give. Buckets are integer epoch indices, so both engines do
    * pure integer arithmetic. The raw table shuffles once; the spine,
    * join and ffill all run over bucket-level rows.
    */
  private def q98GapfillResample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Rolling.resample(
        Tables.withEventTime(t(s, dir, "events")),
        "user_id", "event_time", "value", bucketSeconds = 21600L)
      .select(col("user_id"), col("bucket_start"), col("n_events"),
        round(col("sum_value"), 4).as("sum_value"),
        round(col("filled_sum"), 4).as("filled_sum"))
      .orderBy(col("user_id"), col("bucket_start"))

  /** Interval coalescing (gaps-and-islands): each event padded to a
    * 30-minute interval, overlapping intervals merged into maximal
    * per-user activity spans. One shuffle on the key; running-max +
    * island-sum windows share the sort; the aggregate reuses the
    * partitioning.
    */
  private def q99MergeIntervals(s: SparkSession, dir: String): DataFrame = {
    val sec = unix_timestamp(col("event_time"))
    val iv = Tables.withEventTime(t(s, dir, "events"))
      .select(col("user_id"), sec.as("s"), (sec + 1800L).as("e"))
    graft.operators.Intervals.coalesce(iv, Seq("user_id"), "s", "e")
      .select(col("user_id"), col("span_start"), col("span_end"),
        col("n_intervals"))
      .orderBy(col("user_id"), col("span_start"))
  }

  /** First-order Markov transition matrix of event types per user:
    * consecutive-pair counts via one lead window (no self-join), row
    * probabilities normalized within the from-state over the
    * |states|²-row result.
    */
  private def q100Transitions(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.transitionMatrix(
        Tables.withEventTime(t(s, dir, "events")),
        "user_id", "event_time", "event_type", tieBreak = "event_id")
      .select(col("from_state"), col("to_state"), col("n_transitions"),
        round(col("p"), 6).as("p"))
      .orderBy(col("from_state"), col("to_state"))

  /** Distribution-shape profile: per-returnflag mean / stddev /
    * skewness / excess kurtosis of lineitem quantity from centered
    * power sums — the two-pass form whose formula is pinned identically
    * in the oracle (built-in skewness/kurtosis conventions differ
    * between engines; raw-moment identities cancel catastrophically).
    */
  private def q101Moments(s: SparkSession, dir: String): DataFrame =
    graft.operators.GroupOps.momentStats(t(s, dir, "lineitem"),
        Seq("l_returnflag"), "l_quantity")
      .select(col("l_returnflag"), col("n"), round(col("mean"), 6).as("mean"),
        round(col("stddev"), 6).as("stddev"),
        round(col("skewness"), 6).as("skewness"),
        round(col("kurtosis"), 6).as("kurtosis"))
      .orderBy(col("l_returnflag"))

  /** Inverted index over the document corpus: token → exact doc_freq +
    * the first 20 postings in doc-id order, hapax tail pruned at
    * df ≥ 5. The posting cap applies BEFORE collect_list (windowed
    * row_number over the same token-keyed sort), so no stopword's full
    * posting list is ever materialized.
    */
  private def q102InvertedIndex(s: SparkSession, dir: String): DataFrame =
    graft.operators.Scoring.invertedIndex(t(s, dir, "documents"),
        "doc_id", "text", minDf = 5L, maxPostings = 20)
      .orderBy(col("token"))

  /** Filtered vector search (hybrid metadata + ANN): exact top-k among
    * only the corpus vectors satisfying a metadata predicate — the
    * PRE-filter form. Post-filtering an ANN result k-list loses recall
    * whenever the predicate's survivors are a minority (the classic
    * vector-DB trap); pre-filtering keeps exact recall and pushes the
    * predicate into the parquet scan, so the heap pass reads only the
    * matching fraction of the corpus.
    */
  private def q103FilteredAnn(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val emb = t(s, dir, "embeddings")
    Similarity.bruteForceTopKAtScale(emb.filter(col("vec_id") < 20),
        emb.filter(col("label") === 3), "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbour_id"),
        round(col("cosine_sim"), 6).as("cosine_sim"))
      .orderBy(col("query_id"), col("neighbour_id"))
  }

  /** Temperature-based source rebalancing (alpha = 0.5, expected 300
    * docs): rare languages are upsampled relative to their natural
    * share, the multilingual-pretraining sampling scheme. Membership is
    * the md5-bucket pure function with a quantized threshold, so the
    * oracle reproduces the exact kept set. Output aggregates per
    * language: size, keep probability, kept count, id checksum.
    */
  private def q104TemperatureSample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.temperatureRebalance(t(s, dir, "documents"),
        "doc_id", "lang", alpha = 0.5, targetRows = 300L)
      .groupBy(col("lang"))
      .agg(max(col("group_rows")).as("n_total"),
        round(max(col("keep_p")), 6).as("keep_p"),
        count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_sum"))
      .orderBy(col("lang"))

  /** Robust outlier detection: modified z-score (median/MAD) of event
    * values within each event type, outliers at the conventional
    * |z| > 3.5 cut. Median-based scoring resists the exact heavy tails
    * being hunted (mean/stddev z is circular: outliers inflate the
    * stddev that should expose them).
    */
  private def q105RobustOutliers(s: SparkSession, dir: String): DataFrame =
    graft.operators.GroupOps.robustZscore(t(s, dir, "events"),
        Seq("event_type"), "value")
      .filter(abs(col("robust_z")) > 3.5)
      .select(col("event_id"), col("event_type"),
        round(col("value"), 4).as("value"),
        round(col("robust_z"), 6).as("robust_z"))
      .orderBy(col("event_id"))

  /** Grouped top-k (k > 1, completing q07's top-1): each customer's 3
    * most expensive orders. The rank-then-filter form plans as
    * WindowGroupLimit (per-group top-k inside the sort — asserted for
    * q102), so no group's full order list is held beyond k rows.
    */
  private def q106TopKPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  /** Contribution analysis (share-of-total): each nation's revenue as a
    * fraction of its region's and of the grand total — windowed sums
    * over the AGGREGATED rows (|nations|), so the two extra windows are
    * free; the raw table shuffles once for the group-by.
    */
  private def q107ShareOfTotal(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("o_totalprice")).as("rev"))
    val byRegion = org.apache.spark.sql.expressions.Window.partitionBy(col("r_name"))
    val overall = org.apache.spark.sql.expressions.Window.partitionBy()
    rev
      .withColumn("region_share", round(col("rev") / sum(col("rev")).over(byRegion), 6))
      .withColumn("total_share", round(col("rev") / sum(col("rev")).over(overall), 6))
      .select(col("r_name"), col("n_name"), round(col("rev"), 2).as("rev"),
        col("region_share"), col("total_share"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Zone-map round trip through the custom FileIndex: lineitem is
    * range-clustered and written with a zone-map manifest, read back
    * through [[graft.sources.ZoneMapFileIndex]], and a plain `.filter`
    * prunes files inside the scan (the listing audit lives in
    * ZoneMapsSpec; this query oracle-checks the VALUES that survive the
    * whole write→manifest→prune→scan path). The oracle runs the same
    * predicate over the raw table — pruning must be invisible.
    */
  private def q108ZonemapScan(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.{ZoneMapFileIndex, ZoneMaps}
    // FIXED scratch path + overwrite mode: repeated bench/verify runs
    // reuse one directory instead of accumulating per-call temp copies
    // until /tmp fills (bench runs queries sequentially, so the single
    // path cannot race)
    val tmp = s"${sys.props("java.io.tmpdir")}/graft_q108_zonemap"
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"),
        col("l_extendedprice"))
      .repartitionByRange(8, col("l_orderkey"))
    ZoneMaps.writeWithZoneMap(li, tmp, Seq("l_orderkey"))
    ZoneMapFileIndex.read(s, tmp)
      .filter(col("l_orderkey") >= 100L && col("l_orderkey") <= 1000L)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy(col("l_returnflag"))
  }

  /** Real RIFF/WAVE PCM decode: synthetic audio payloads are genuine
    * WAV files ([[graft.operators.Multimodal.synthWav]]); duration/
    * peak/sum-of-squares/RMS come from parsing the actual chunk list
    * and PCM bytes. Oracle-checked: the sample values are pure
    * arithmetic in (media_id, flat index), so DuckDB reproduces every
    * column — the integer stats exactly, RMS to 6 rounded decimals.
    */
  private def q109AudioFeatures(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val media = Multimodal.synthesize(s, 300).filter(col("modality") === "audio")
    Multimodal.audioStats(media).toDF()
      .select(col("mediaId").as("media_id"),
        col("sampleRate").as("sample_rate"), col("channels"),
        col("bits"), col("nFrames").as("n_frames"),
        col("durationUs").as("duration_us"), col("peak"),
        col("sumSq").as("sum_sq"), round(col("rms"), 6).as("rms"))
      .orderBy(col("media_id"))
  }

  /** Real ISO BMFF (MP4) metadata extraction over genuine container
    * payloads: the box walk (size==1 largesize, size==0 terminal box,
    * and mdat-before-moov layouts are all exercised ON DISK across the
    * synth corpus), mvhd movie clock (32- and 64-bit versions), the
    * video trak's tkhd 16.16 dims, stsd codec fourcc, stsz frame
    * count. Oracle-checked: the synth geometry is pure arithmetic in
    * media_id ([[graft.operators.Multimodal.synthMp4Geom]]), so DuckDB
    * restates every column in closed form.
    */
  private def q110VideoMetadata(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val media = Multimodal.synthesize(s, 300).filter(col("modality") === "video")
    Multimodal.videoMetadata(media).toDF()
      .select(col("mediaId").as("media_id"), col("codec"),
        col("timescale"), col("durationTicks").as("duration_ticks"),
        col("width"), col("height"), col("nFrames").as("n_frames"),
        col("durationUs").as("duration_us"))
      .orderBy(col("media_id"))
  }

  /** SemDeDup-style semantic dedup over the embedding corpus: IVF cells
    * from the 8 deterministic seed centroids (`vec_id < 8`, the q43
    * convention), then within-cell cosine dominance — a vector is
    * dropped iff a LOWER-id cell-mate is ≥ 0.40 similar, so the lowest
    * id in each near-duplicate neighbourhood survives. Pairwise work is
    * Σ|cell|², never corpus² (the SemDeDup scaling argument); the
    * oracle restates dominance as one NOT EXISTS over the same cell
    * assignment.
    */
  private def q111SemanticDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val emb = t(s, dir, "embeddings")
    val centroids = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    Similarity.semanticDedup(emb, "vec_id", "embedding",
        centroids, "cid", "cvec", threshold = 0.40)
      .select(col("vec_id"), col("cell"))
      .orderBy(col("vec_id"))
  }

  /** Bigram-LM cross-entropy per document (the KenLM-shaped perplexity
    * quality filter, corpus-as-model): MLE bigram probabilities fit on
    * the whole corpus in one explode pass, each doc scored by the mean
    * -log2 P(w2|w1) of its own bigrams. Per-doc multiplicities collapse
    * before any join; both model tables are vocab-bounded aggregates.
    * The oracle restates the identical ratio arithmetic.
    */
  private def q112LmCrossEntropy(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Scoring
    Scoring.bigramCrossEntropy(t(s, dir, "documents"), "doc_id", "text")
      .select(col("doc_id"), col("n_bigrams"),
        round(col("cross_entropy"), 6).as("cross_entropy"))
      .orderBy(col("doc_id"))
  }

  /** Damped PageRank (3 power iterations, d = 0.85) over the
    * symmetrized part–supplier co-purchase graph from lineitem —
    * centrality over a corpus-derived graph, the link-analysis shape a
    * web-scale pipeline runs on its domain/dup graphs. Iterations are
    * constant-size stages with lineage truncated per step
    * ([[graft.operators.Graph.pageRank]]); the oracle unrolls the same
    * three iterations in SQL. Ranks scaled ×1000 before rounding so
    * six decimals keep real precision at N ≈ thousands of nodes.
    */
  private def q113PageRank(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Graph
    val li = t(s, dir, "lineitem")
      .select(concat(lit("p:"), col("l_partkey")).as("a"),
        concat(lit("s:"), col("l_suppkey")).as("b"))
    val edges = li.unionByName(li.select(col("b").as("a"), col("a").as("b")))
    Graph.pageRank(edges, "a", "b", iterations = 3, damping = 0.85)
      .select(col("id"), round(col("pr") * 1000, 6).as("pr_milli"))
      .orderBy(col("id"))
  }

  /** The mining-regime LSH configuration itself, oracle-checked: same
    * near-dup contract as q44 (bigram shingles, threshold 0.5, classed
    * miner) but under [[graft.operators.Dedup.selectiveBanding]] inside
    * a 320-hash budget — r = 3 rows per band instead of autoBanding's
    * r = 2, the banding SURVEY §9.1 adjudicates as the 100 TB default
    * (measured ~4.5× candidate cut at identical output). Banding changes
    * candidate efficiency, never the verified output (miss ≤ 1e-6 at
    * threshold), so the brute-force bigram-Jaccard oracle must match
    * exactly — which is precisely the property that makes the scale
    * configuration safe to adopt.
    */
  private def q114SelectiveLsh(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    val (k, b) = Dedup.selectiveBanding(0.5, maxHashes = 320)
    Dedup.minhashDupPairsClassed(t(s, dir, "documents"), "doc_id", "text", "lang", 0.5,
        numHashes = k, bands = b, ngram = 2)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Incremental dedup through a persisted-shape MinHash band index:
    * the corpus (doc_id % 5 != 0) is indexed once, then the "new batch"
    * (doc_id % 5 == 0) probes it — corpus-vs-batch near-dup pairs at
    * token Jaccard ≥ 0.9 with exact verification. The oracle brute-
    * forces the cross-pairs; banding miss at the threshold is ≤ 1e-9
    * (autoBanding(0.9) → 16 bands × 3 rows), so the sets must match
    * exactly. The timed query includes the index build — the bench
    * measures both halves of the ingestion cycle.
    */
  private def q115IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    val docs = t(s, dir, "documents")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val index = Dedup.minhashIndex(corpus, "doc_id", "text", "lang", 0.9)
    Dedup.incrementalDupPairs(batch, corpus, index, "doc_id", "text", "lang", 0.9)
      .select(col("corpus_id"), col("new_id"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("corpus_id"), col("new_id"))
  }

  /** CCNet-style line-level boilerplate removal. The synthetic corpus is
    * single-line, so the query first segments every document into
    * 10-token lines (a deterministic regexp the oracle restates — the
    * segmentation is an input property, the operator takes any
    * delimiter), then drops lines whose normalized content appears in
    * ≥ 2 distinct documents and reassembles the rest in order.
    */
  private def q116LineDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    val seg = t(s, dir, "documents").withColumn("text",
      regexp_replace(col("text"), "((?:\\S+ ){9}\\S+) ", "$1\n"))
    Dedup.lineDedup(seg, "doc_id", "text", minDocs = 2)
      .orderBy(col("doc_id"))
  }

  /** Sketch-table EXACT distinct rollup ([[graft.operators.Sketches]]):
    * one roaring-style bitmap of user_id per (event_type, day) shard —
    * the persisted sketch-table shape — then distinct users per
    * event_type by unioning shard sketches
    * ([[graft.expressions.BitmapBuildAgg]]/[[BitmapUnionAgg]]). The
    * rollup aggregation touches KB-sized sketches, never the raw keys;
    * because the bitmap is exact (unlike HLL), the oracle is a plain
    * `count(distinct user_id)` — the incremental path must equal the
    * cold re-scan bit-for-bit. Reference anchor: full-column
    * `nunique()` re-scans in pandas_based/src/data_clean.py restated
    * as mergeable persisted state.
    */
  private def q117BitmapDistinct(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sketches
    val ev = Tables.withEventTime(t(s, dir, "events"))
    val shards = Sketches.bitmapShards(ev,
      Seq(col("event_type"), to_date(col("event_time")).as("day")), col("user_id"))
    Sketches.bitmapRollup(shards, Seq(col("event_type")))
      .select(col("event_type"), col("n_shards"),
        col("n_distinct").as("distinct_users"))
      .orderBy(col("event_type"))
  }

  /** Sketch-table APPROXIMATE distinct rollup on Spark's Datasketches
    * HLL built-ins (`hll_sketch_agg`/`hll_union_agg`, lgK = 12) — the
    * same shard→rollup shape as q117 for key domains too wide to
    * bitmap. The Datasketches estimate is engine-specific, so the
    * CROSS-ENGINE row is the BANDED comparison table: exact distinct
    * (restated verbatim by DuckDB) plus a `within_2pct` verdict that
    * the sharded-rollup estimate lands inside the lgK=12 accuracy band
    * — if the estimator ever drifts out of band the boolean flips and
    * the hash gate fails. SketchesSpec additionally pins the direct
    * single-pass sketch and rollup determinism engine-side.
    */
  private def q118HllRollup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sketches
    val ev = Tables.withEventTime(t(s, dir, "events"))
    val shards = Sketches.hllShards(ev,
      Seq(col("event_type"), to_date(col("event_time")).as("day")), col("user_id"))
    val approx = Sketches.hllRollup(shards, Seq(col("event_type")))
      .select(col("event_type"), col("n_shards"), col("approx_distinct"))
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
    approx.join(exact, Seq("event_type"))
      .select(col("event_type"), col("n_shards"), col("exact_distinct"),
        (abs(col("approx_distinct") - col("exact_distinct")) <=
          col("exact_distinct") * lit(0.02)).as("within_2pct"))
      .orderBy(col("event_type"))
  }

  /** Frame sampling over real MP4 sample tables: every 2nd sample's
    * byte extent + decode timestamp, resolved from the actual stsz/
    * stsc/stco/stts boxes ([[graft.operators.Multimodal.mp4SampleTable]]),
    * with a signed-byte checksum of the REAL bytes at the resolved
    * offset — the range a real pipeline hands to the codec. The synth
    * geometry is closed-form in media_id, so DuckDB restates every
    * column including the checksum (the mdat byte at flat index j is
    * (i·31 + j·7) mod 251, signed).
    */
  private def q119FrameSample(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val media = Multimodal.synthesize(s, 300).filter(col("modality") === "video")
    Multimodal.frameSamples(media, stride = 2).toDF()
      .select(col("mediaId").as("media_id"), col("sampleIdx").as("sample_idx"),
        col("chunkIdx").as("chunk_idx"), col("size"),
        col("offsetInChunk").as("offset_in_chunk"),
        col("dtsTicks").as("dts_ticks"), col("dtsUs").as("dts_us"),
        col("sync"), col("byteSum").as("byte_sum"))
      .orderBy(col("media_id"), col("sample_idx"))
  }

  /** Sketch-table QUANTILE rollup ([[graft.operators.Sketches]]):
    * one DDSketch of `value` per (event_type, day) shard at α = 1%,
    * bin-wise union per event_type, p50/p95/p99 off the merged sketch
    * — latency-style percentile tables maintained incrementally. The
    * estimate is algorithm-specific (log-binned midpoints), so the
    * CROSS-ENGINE row is the BANDED comparison table: the exact
    * rank-order statistics at the sketch's own rank convention
    * (rank = ⌊q·(n−1)+0.5⌋, DuckDB restates them via row_number) plus
    * per-quantile `within_alpha` verdicts — DDSketch's bin-midpoint
    * guarantee makes |est − exact| ≤ α·exact a theorem, so a false
    * verdict means a real sketch bug and the hash gate fails.
    * SketchesSpec additionally pins the shard-union byte-identity.
    *
    * The exact side ranks values per event_type with a window — the
    * partition count equals the group count (5 here), which is the
    * honest shape for an exact-quantile VERIFICATION query; the
    * production answer path is the sketch itself.
    */
  private def q120QuantileSketch(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sketches
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.withEventTime(t(s, dir, "events"))
    val shards = Sketches.ddsketchShards(ev,
      Seq(col("event_type"), to_date(col("event_time")).as("day")), col("value"))
    val rolled = Sketches.ddsketchRollup(shards, Seq(col("event_type")))
    val vals = ev.filter(col("value").isNotNull && !isnan(col("value")))
      .select(col("event_type"), col("value"))
    val ranked = vals
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("value"))))
      .join(broadcast(vals.groupBy(col("event_type")).agg(count(lit(1)).as("n"))),
        Seq("event_type"))
    def rankOf(q: Double): Column = floor(lit(q) * (col("n") - 1) + 0.5) + 1
    val exact = ranked
      .filter(col("rn") === rankOf(0.5) || col("rn") === rankOf(0.95) ||
        col("rn") === rankOf(0.99))
      .groupBy(col("event_type"))
      .agg(
        max(when(col("rn") === rankOf(0.5), col("value"))).as("__e50"),
        max(when(col("rn") === rankOf(0.95), col("value"))).as("__e95"),
        max(when(col("rn") === rankOf(0.99), col("value"))).as("__e99"))
    def band(est: String, ex: String): Column =
      abs(col(est) - col(ex)) <= abs(col(ex)) * lit(0.01) + lit(1e-9)
    rolled.join(exact, Seq("event_type"))
      .select(col("event_type"), col("n_shards"),
        round(col("__e50"), 6).as("exact_p50"),
        round(col("__e95"), 6).as("exact_p95"),
        round(col("__e99"), 6).as("exact_p99"),
        band("p50", "__e50").as("p50_within_alpha"),
        band("p95", "__e95").as("p95_within_alpha"),
        band("p99", "__e99").as("p99_within_alpha"))
      .orderBy(col("event_type"))
  }

  /** Product-quantization encode ([[graft.operators.Pq]]), oracle-
    * checked: codebooks are the 16 lowest-id corpus vectors' subvectors
    * (the deterministic-reference convention q43/q111 use for
    * centroids), so the per-subspace argmin is pure double arithmetic
    * DuckDB restates verbatim — including the lowest-index tie-break.
    * Output is one row per (vector, subspace) with its 4-bit code: the
    * 32x-compressed corpus representation ADC search (q122) scans
    * instead of raw embeddings.
    */
  private def q121PqEncode(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Pq
    import s.implicits._
    val emb = t(s, dir, "embeddings")
    val ref = emb.filter(col("vec_id") < 16).orderBy("vec_id")
      .select(col("embedding")).as[Array[Float]].collect()
    val (m, dsub) = (8, 8)
    val cents = Array.tabulate(m, 16)((sp, j) =>
      java.util.Arrays.copyOfRange(ref(j), sp * dsub, (sp + 1) * dsub))
    Pq.encode(emb, "vec_id", "embedding", Pq.Codebooks(m, dsub, 16, cents)).toDF()
      .select(col("id").as("vec_id"), posexplode(col("code")))
      .select(col("vec_id"), col("pos").as("subspace"), col("col").as("code"))
      .orderBy(col("vec_id"), col("subspace"))
  }

  /** PQ asymmetric-distance search over the trained codebooks
    * ([[graft.operators.Pq.fit]], 5 Lloyd iterations on the
    * deterministic lowest-id sample): ADC shortlists 128 candidates per
    * query off CODES alone, then [[graft.operators.Pq.adcTopKRefined]]
    * re-ranks only those 128 by exact L2 — the FAISS search pipeline.
    * Training is engine-side k-means, so the CROSS-ENGINE row is the
    * BANDED comparison table: DuckDB restates the exact L2 top-10 per
    * query (md5 of the rank-ordered id list via `list_distance`) and
    * the `recall_ok` verdict asserts the refined PQ result recovers
    * ≥ 0.7 of that exact set — a codebook/encode/ADC regression drops
    * recall and fails the hash gate. PqSpec additionally pins the ADC
    * arithmetic against table-free reconstruction distances exactly.
    */
  private def q122PqAdc(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Pq
    val emb = t(s, dir, "embeddings")
    val cb = Pq.fit(emb, "vec_id", "embedding", m = 8, ksub = 16, iters = 5)
    val codes = Pq.encode(emb, "vec_id", "embedding", cb)
    val queries = emb.filter(col("vec_id") < 5)
    val refined = Pq
      .adcTopKRefined(queries, emb, codes, "vec_id", "embedding", cb,
        k = 10, shortlist = 128)
      .select(col("query_id"), col("neighbor_id"))
    bandedRecallVsExactL2(emb, queries, refined, hitFloor = 7)
  }

  /** The banded-recall comparison table shared by q122/q152: DuckDB
    * restates the exact L2 top-10 per query (self included, matching
    * the ADC corpus scans; same double ascending-dimension arithmetic
    * as `list_distance`); `recall_ok` asserts the approximate result
    * recovered ≥ `hitFloor` of those 10.
    */
  private def bandedRecallVsExactL2(emb: DataFrame, queries: DataFrame,
                                    approx: DataFrame, hitFloor: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qv = queries.select(col("vec_id").cast("long").as("query_id"),
      col("embedding").as("__qv"))
    val cv = emb.select(col("vec_id").cast("long").as("neighbor_id"),
      col("embedding").as("__nv"))
    val exact = broadcast(qv).join(cv)
      .withColumn("__d", aggregate(
        zip_with(col("__qv"), col("__nv"), (a, b) => {
          val d = a.cast("double") - b.cast("double")
          d * d
        }),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("__d").asc, col("neighbor_id").asc)))
      .filter(col("rank") <= 10)
    val exactAgg = exact.groupBy(col("query_id"))
      .agg(md5(concat_ws(",",
        transform(array_sort(collect_list(struct(col("rank"), col("neighbor_id")))),
          x => x.getField("neighbor_id").cast("string")))).as("exact_top10_md5"))
    val hits = approx
      .join(exact.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("__n_hit"))
    exactAgg.join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("exact_top10_md5"),
        (coalesce(col("__n_hit"), lit(0L)) >= lit(hitFloor.toLong)).as("recall_ok"))
      .orderBy(col("query_id"))
  }

  /** Retrieval-quality evaluation ([[graft.operators.Retrieval]]):
    * P@10 / R@10 / MRR / nDCG@10 of exact cosine top-10 against
    * label-match relevance — the eval loop every retrieval index
    * change reruns. The ranking is the q27 convention (cosine desc,
    * id asc), judgments are same-label pairs (grade 1), and the
    * oracle restates the whole metric arithmetic — DCG logs included
    * — in SQL.
    */
  private def q123RetrievalMetrics(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Retrieval, Similarity}
    import org.apache.spark.sql.expressions.Window
    val emb = t(s, dir, "embeddings")
    val results = Similarity
      .bruteForceTopKAtScale(emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", 10)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine_sim").desc, col("neighbour_id").asc)))
    val labels = emb.select(col("vec_id"), col("label"))
    val judgments = labels.filter(col("vec_id") < 5).as("q")
      .join(labels.as("c"),
        col("q.label") === col("c.label") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbour_id"),
        lit(1.0).as("grade"))
    Retrieval.rankingMetrics(results, judgments,
        "query_id", "neighbour_id", "rank", "grade", k = 10)
      .select(col("query_id"), col("n_relevant_total"), col("n_relevant_retrieved"),
        round(col("precision_k"), 6).as("precision_k"),
        round(col("recall_k"), 6).as("recall_k"),
        round(col("mrr"), 6).as("mrr"),
        round(col("ndcg"), 6).as("ndcg"))
      .orderBy(col("query_id"))
  }

  /** Real learned-subword tokenization ([[graft.operators.Bpe]],
    * Sennrich 2016), replacing the q_tokens regex approximation for
    * token accounting: 200 merges trained on the corpus's own word
    * frequencies (distributed count, bounded-vocab driver loop), then
    * map-side encode with per-partition word memoization. Training is
    * iterative, so the CROSS-ENGINE row is the LOSSLESSNESS round-trip
    * replayed per document: detokenizing the emitted tokens (join,
    * `</w>` → space, rtrim) must reproduce the whitespace-normalized
    * lowercase original, whose md5 and word count DuckDB restates
    * verbatim — any merge/encode corruption breaks the round-trip and
    * fails the hash gate. BpeSpec additionally pins the paper's worked
    * merge sequence.
    */
  private def q124BpeTokenize(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Bpe
    val docs = t(s, dir, "documents")
    val model = Bpe.train(docs, "text", numMerges = 200)
    val norm = docs.select(col("doc_id").cast("long").as("id"),
      concat_ws(" ", filter(split(lower(trim(col("text"))), "\\s+"),
        w => w =!= lit(""))).as("__norm"))
    Bpe.encode(docs, "doc_id", "text", model).toDF()
      .join(norm, Seq("id"))
      .select(col("id").as("doc_id"),
        md5(col("__norm")).as("norm_md5"),
        size(filter(split(col("__norm"), " "), w => w =!= lit(""))).as("n_words"),
        (rtrim(replace(concat_ws("", col("tokens")), lit(Bpe.EndOfWord), lit(" ")))
          === col("__norm")).as("lossless"))
      .orderBy(col("doc_id"))
  }

  /** Snapshot drift gate ([[graft.operators.Drift]]): PSI + KL of the
    * events value distribution per event_type, first half of January
    * as baseline vs the second half — the admit-or-alert check a
    * continuously-ingesting pipeline runs per batch. Fixed-width bins
    * over the baseline's [min,max] keep the bin function closed-form
    * IEEE arithmetic, so the oracle replays binning, alignment,
    * eps-flooring and both logs exactly.
    */
  private def q125DriftPsi(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Drift
    val ev = Tables.withEventTime(t(s, dir, "events"))
    val cut = lit("2024-01-15").cast("timestamp")
    Drift.psiSummary(ev.filter(col("event_time") < cut),
        ev.filter(col("event_time") >= cut),
        Seq("event_type"), "value", nBins = 10)
      .select(col("event_type"), col("n_bins"),
        round(col("psi"), 6).as("psi"), round(col("kl"), 6).as("kl"))
      .orderBy(col("event_type"))
  }

  /** Synchronous label propagation ([[graft.operators.Graph
    * .labelPropagation]]) over the q113 symmetrized part–supplier
    * graph, 2 iterations — community detection on a corpus-derived
    * graph with the deterministic schedule (sync + smallest-label
    * ties) that lets the oracle unroll both iterations in SQL.
    */
  private def q126LabelProp(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Graph
    val li = t(s, dir, "lineitem")
      .select(concat(lit("p:"), col("l_partkey")).as("a"),
        concat(lit("s:"), col("l_suppkey")).as("b"))
    val edges = li.unionByName(li.select(col("b").as("a"), col("a").as("b")))
    Graph.labelPropagation(edges, "a", "b", iterations = 2)
      .orderBy(col("id"))
  }

  /** Cohort retention from persisted-shape bitmap sketches: per
    * event_type, one bitmap of first-half users and one of second-half
    * users (conditional build — nulls skip), then |A ∩ B| via
    * `bitmap_and_cardinality`'s wire-format chunk merge-join
    * ([[graft.expressions.BitmapAndCardinality]]) — the
    * audience-overlap question answered without a raw-key self-join.
    * Exact, so the oracle is the plain DISTINCT-users intersection.
    */
  private def q127Retention(s: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(s)
    val ev = Tables.withEventTime(t(s, dir, "events"))
    val cut = lit("2024-01-15").cast("timestamp")
    ev.groupBy(col("event_type"))
      .agg(
        call_function("bitmap_build",
          when(col("event_time") < cut, col("user_id"))).as("a"),
        call_function("bitmap_build",
          when(col("event_time") >= cut, col("user_id"))).as("b"))
      .select(col("event_type"),
        call_function("bitmap_cardinality", col("a")).as("users_p1"),
        call_function("bitmap_cardinality", col("b")).as("users_p2"),
        call_function("bitmap_and_cardinality", col("a"), col("b")).as("retained"))
      .withColumn("retention_rate",
        round(col("retained") / col("users_p1"), 6))
      .orderBy(col("event_type"))
  }

  /** The q125 drift gate re-answered from PERSISTED sketches: per-day
    * DDSketch shards roll up into a first-half and a second-half
    * sketch per event_type, and `ddsketch_psi` compares the two bin
    * histograms directly — no raw-value re-scan, the drift check a
    * sketch-table warehouse runs nightly. Log-γ bins differ from
    * q125's fixed-width bins, so the indices differ numerically while
    * agreeing on the verdict; the CROSS-ENGINE row is therefore the
    * BANDED comparison table: the exact fixed-width PSI (DuckDB
    * restates q125's full binning arithmetic) plus two verdicts —
    * `within_band` (|sketch PSI − exact PSI| ≤ 0.25, measured head-
    * room ~0.08) and `verdict_agree` (both sides land on the same
    * side of the 0.25 major-drift threshold). A sketch-PSI regression
    * flips a boolean and fails the hash gate; SketchesSpec pins the
    * PSI arithmetic itself.
    */
  private def q128SketchDrift(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sketches
    val ev = Tables.withEventTime(t(s, dir, "events"))
    val cut = lit("2024-01-15").cast("timestamp")
    // alpha 0.25, NOT the quantile default 0.01: PSI over log-γ bins
    // needs bins wide enough to hold real mass — at α = 0.01 the ~2%
    // bins slice 10k values into thousands of near-empty cells and
    // eps-noise masquerades as drift (measured on this stable split:
    // PSI ~1.5 at α=0.01, ~0.14 at α=0.1, ~0.03–0.09 at α=0.25 vs
    // fixed-width q125's ~0.01 verdict; the α=0.1/0.25 figures are
    // reproduced exactly by an independent numpy replay). The accuracy
    // knob doubles as the drift-resolution knob.
    val shards = Sketches.ddsketchShards(ev,
      Seq(col("event_type"), to_date(col("event_time")).as("day")), col("value"),
      alpha = 0.25)
      .withColumn("half", col("day") < to_date(cut))
    val halves = shards.groupBy(col("event_type"), col("half"))
      .agg(call_function("ddsketch_merge_agg", col("sketch")).as("sketch"))
    val a = halves.filter(col("half")).select(col("event_type"), col("sketch").as("base"))
    val b = halves.filter(!col("half")).select(col("event_type"), col("sketch").as("cur"))
    val sketchPsi = a.join(b, "event_type")
      .select(col("event_type"),
        call_function("ddsketch_psi", col("base"), col("cur")).as("__psi_sk"))
    val exactPsi = graft.operators.Drift
      .psiSummary(ev.filter(col("event_time") < cut),
        ev.filter(col("event_time") >= cut),
        Seq("event_type"), "value", nBins = 10)
      .select(col("event_type"), col("psi").as("__psi_ex"))
    sketchPsi.join(exactPsi, Seq("event_type"))
      .select(col("event_type"),
        round(col("__psi_ex"), 6).as("psi_exact"),
        (abs(col("__psi_sk") - col("__psi_ex")) <= lit(0.25)).as("within_band"),
        ((col("__psi_sk") < lit(0.25)) === (col("__psi_ex") < lit(0.25)))
          .as("verdict_agree"))
      .orderBy(col("event_type"))
  }

  /** Triangle counts + local clustering coefficient over the part
    * co-order graph (parts sharing an order are linked) — cohesion
    * scoring for corpus graphs via [[graft.operators.Graph.triangleCounts]]'
    * degree-oriented wedge mining: O(m^{3/2}) wedge volume regardless of
    * hub skew, each triangle found once at its lowest-(degree,id) apex.
    * Exact, so the oracle brute-forces ordered triangles x<y<z with
    * three edge joins.
    */
  private def q129Triangles(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Graph
    val ps = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val edges = ps.as("x").join(ps.as("y"),
        col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .select(col("x.p").as("a"), col("y.p").as("b"))
    Graph.triangleCounts(edges, "a", "b")
      .select(col("id").as("part_id"), col("degree"), col("triangles"),
        round(col("lcc"), 6).as("lcc"))
      .orderBy(col("part_id"))
  }

  /** DSIR importance weights (Xie et al. 2023): every document scored
    * by ln p̂_en(x) − ln p̂_raw(x) under hashed unigram+bigram models —
    * target = the English subset, raw = the whole corpus — the
    * data-selection signal that shifts a crawl toward a curated
    * distribution. Exact log-ratio arithmetic, md5-prefix bucket hash
    * (q25 convention), so the oracle replays the entire pipeline.
    */
  private def q130DsirWeights(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dsir
    val docs = t(s, dir, "documents")
    Dsir.importanceWeights(docs, docs.filter(col("lang") === "en"),
        "doc_id", "text", buckets = 1024, alpha = 1.0)
      .select(col("id").as("doc_id"), col("n_grams"),
        round(col("weight"), 6).as("weight"))
      .orderBy(col("doc_id"))
  }

  /** The q127 retention question re-answered from KMV/theta sketches
    * ([[graft.expressions.KmvSketch]]) — constant-memory audience
    * overlap for key domains where exact bitmaps can't fit and HLL
    * can't intersect. The md5-prefix hash makes every estimate a pure
    * function of the key sets, so the oracle replays the k-smallest
    * scan and the θ-cut arithmetic EXACTLY — an approximate sketch
    * with an exact-match oracle.
    */
  private def q131KmvRetention(s: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(s)
    val ev = Tables.withEventTime(t(s, dir, "events"))
      .filter(col("user_id").isNotNull)
    val cut = lit("2024-01-15").cast("timestamp")
    ev.groupBy(col("event_type"))
      .agg(
        call_function("kmv_build",
          when(col("event_time") < cut, col("user_id")), lit(256)).as("a"),
        call_function("kmv_build",
          when(col("event_time") >= cut, col("user_id")), lit(256)).as("b"))
      .select(col("event_type"),
        round(call_function("kmv_cardinality", col("a")), 6).as("est_p1"),
        round(call_function("kmv_cardinality", col("b")), 6).as("est_p2"),
        round(call_function("kmv_and_cardinality", col("a"), col("b")), 6)
          .as("est_retained"),
        round(call_function("kmv_or_cardinality", col("a"), col("b")), 6)
          .as("est_either"))
      .orderBy(col("event_type"))
  }

  /** Hard-negative mining ([[graft.operators.Retrieval.hardNegatives]],
    * the DPR/ANCE recipe): top-20 exact candidates per query minus the
    * label-match positives, first 5 survivors re-ranked — the
    * contrastive-training byproduct of the q123 evaluation setup.
    * Fully deterministic (q27 ordering convention), so the oracle
    * restates the whole mine in SQL.
    */
  private def q132HardNegatives(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Retrieval, Similarity}
    import org.apache.spark.sql.expressions.Window
    val emb = t(s, dir, "embeddings")
    val results = Similarity
      .bruteForceTopKAtScale(emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", 20)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine_sim").desc, col("neighbour_id").asc)))
    val labels = emb.select(col("vec_id"), col("label"))
    val positives = labels.filter(col("vec_id") < 5).as("q")
      .join(labels.as("c"),
        col("q.label") === col("c.label") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbour_id"))
    Retrieval.hardNegatives(results, positives,
        "query_id", "neighbour_id", "rank", n = 5)
      .select(col("query_id"), col("neg_rank").cast("long").as("neg_rank"),
        col("neighbour_id"), round(col("cosine_sim"), 6).as("cosine_sim"))
      .orderBy(col("query_id"), col("neg_rank"))
  }

  /** Count-min point-frequency estimates ([[graft.expressions.Cms]],
    * Cormode & Muthukrishnan 2005) vs exact counts for the corpus's 30
    * most frequent tokens — the "how often did THIS key occur" question
    * [[graft.expressions.MisraGries]] can't answer for keys it dropped,
    * in 64 KB regardless of vocabulary size. The md5-row-hash grid is
    * deterministic, so the oracle rebuilds every cell and replays the
    * min-over-rows estimate exactly.
    */
  private def q133CmsFreq(s: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(s)
    val toks = t(s, dir, "documents")
      .select(explode(
        filter(split(lower(trim(col("text"))), " "), t => t =!= lit("")))
        .as("token"))
    val sketch = toks.agg(
      call_function("cms_build", col("token"), lit(2048), lit(4)).as("sk"))
    val top = toks.groupBy("token").agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("token").asc).limit(30)
    top.crossJoin(broadcast(sketch))
      .select(col("token"), col("exact"),
        call_function("cms_estimate", col("sk"), col("token")).as("cms_est"))
      .orderBy(col("exact").desc, col("token"))
  }

  /** Real image downsampling ([[graft.operators.Multimodal.imagePool]]):
    * 4×4 box-mean thumbnails over actually-decoded BMP pixels — the
    * resize kernel a vision pipeline runs before embedding, with
    * payloads reduced in-partition. The synthetic corpus pins every
    * pixel byte in closed form ((i·31 + 7p) mod 251, the q36
    * convention), so the oracle recomputes every cell mean exactly.
    */
  private def q134ImagePool(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val media = Multimodal.synthesize(s, 300)
    Multimodal.imagePool(media, gridW = 4, gridH = 4).toDF()
      .select(col("mediaId").as("media_id"), col("cellX").as("cell_x"),
        col("cellY").as("cell_y"),
        round(col("rMean"), 4).as("r_mean"),
        round(col("gMean"), 4).as("g_mean"),
        round(col("bMean"), 4).as("b_mean"))
      .orderBy(col("media_id"), col("cell_y"), col("cell_x"))
  }

  /** Deterministic epoch shuffle ([[graft.operators.Layout.seededShuffle]]):
    * the corpus's training order for "epoch 0" as a pure function of
    * (seed, doc_id) — md5 sort key + two-phase prefix-sum positions,
    * no single-partition window, reproducible and resumable where
    * ORDER BY rand() is neither. The oracle is the windowed
    * restatement of the same md5 order.
    */
  private def q135CorpusShuffle(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Layout
    Layout.seededShuffle(t(s, dir, "documents"), "doc_id", "ep0")
      .select(col("doc_id"), col("position"))
      .orderBy(col("doc_id"))
  }

  /** Real audio spectral features
    * ([[graft.operators.Multimodal.audioSpectrum]]): DFT bin energies
    * over actually-decoded WAV channel-0 samples, log-compressed. The
    * synthetic samples are closed-form ((i·31 + 7j) mod 251 − 125), so
    * the oracle replays decode, trig weighting and normalization
    * exactly — the ln keeps the cross-engine float round stable.
    */
  private def q136AudioSpectrum(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val media = Multimodal.synthesize(s, 300)
    Multimodal.audioSpectrum(media, bins = Seq(1, 2, 4, 8))
      .select(col("media_id"), col("bin"),
        round(col("log_power"), 6).as("log_power"))
      .orderBy(col("media_id"), col("bin"))
  }

  /** Join-size estimation from persisted key sketches
    * ([[graft.expressions.CmsInnerProduct]], the Cormode–Muthukrishnan
    * inner-product estimator): |A ⋈ B| = Σ_k f_A(k)·f_B(k) answered
    * from two 128 KB grids without touching either table — the
    * broadcast-vs-shuffle / skew-predetection input a join planner
    * wants. Measured against the exact join sizes for the
    * lineitem⋈orders FK join and the skewed lineitem self-join; the
    * deterministic grid makes the estimates exactly SQL-replayable.
    */
  private def q137JoinCardinality(s: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(s)
    val li = t(s, dir, "lineitem")
    val ord = t(s, dir, "orders")
    def sk(df: DataFrame, key: String) =
      df.agg(call_function("cms_build", col(key), lit(4096), lit(4)).as("sk"))
    val cL = li.groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("ca"))
    val cO = ord.groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("cb"))
    val cP = li.groupBy(col("l_partkey").as("k")).agg(count(lit(1)).as("c"))
    val row1 = cL.join(cO, "k").agg(sum(col("ca") * col("cb")).as("exact"))
      .crossJoin(broadcast(sk(li, "l_orderkey").select(col("sk").as("a"))))
      .crossJoin(broadcast(sk(ord, "o_orderkey").select(col("sk").as("b"))))
      .select(lit("lineitem_orders_orderkey").as("join_key"), col("exact"),
        call_function("cms_inner_product", col("a"), col("b")).as("cms_est"))
    val row2 = cP.agg(sum(col("c") * col("c")).as("exact"))
      .crossJoin(broadcast(sk(li, "l_partkey").select(col("sk").as("a"))))
      .select(lit("lineitem_self_partkey").as("join_key"), col("exact"),
        call_function("cms_inner_product", col("a"), col("a")).as("cms_est"))
    row1.unionByName(row2).orderBy(col("join_key"))
  }

  /** Per-group deterministic uniform sample
    * ([[graft.expressions.BottomKSampleAgg]]): 5 example user ids per
    * event_type in one aggregation pass — hash-order bottom-k over
    * distinct keys, mergeable across shards, rerun-stable where
    * rand()-sampling is not. The md5 pick rule is exactly replayable
    * in SQL.
    */
  private def q138GroupSample(s: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(s)
    t(s, dir, "events").filter(col("user_id").isNotNull)
      .groupBy(col("event_type"))
      .agg(call_function("sample_bottomk", col("user_id"), lit(5)).as("sample"))
      .select(col("event_type"), posexplode(col("sample")).as(Seq("pos", "user_id_str")))
      .select(col("event_type"), col("pos").cast("long").as("pos"), col("user_id_str"))
      .orderBy(col("event_type"), col("pos"))
  }

  /** Bounded k-core peeling ([[graft.operators.Graph.kCore]]) over the
    * part co-order graph: two rounds of delete-degree-<90, surviving
    * subgraph degrees out — the dense-core extractor for corpus
    * graphs, oracle-checked by unrolling both peels in SQL.
    */
  private def q139Kcore(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Graph
    val ps = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val edges = ps.as("x").join(ps.as("y"),
        col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .select(col("x.p").as("a"), col("y.p").as("b"))
    Graph.kCore(edges, "a", "b", k = 90, rounds = 2)
      .select(col("id").as("part_id"), col("degree"))
      .orderBy(col("part_id"))
  }

  /** Hilbert-curve linearization ([[graft.expressions.HilbertIndex2]],
    * codegen'd): the locality-preserving companion to q54's Morton
    * z-order — consecutive indices are always grid-adjacent, so range
    * partitions tile compactly. The oracle is the identical arithmetic
    * unrolled one SQL level per bit
    * ([[graft.operators.Layout.hilbertSqlLevels]], the q54 contract).
    */
  private def q140Hilbert(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "lineitem")
      .filter(col("l_orderkey") < 3000)
      .select((col("l_orderkey") % 256).cast("long").as("x"),
        (col("l_partkey") % 256).cast("long").as("y"))
    base.withColumn("h",
        graft.operators.Layout.hilbertValue2(base, col("x"), col("y"), 8))
      .orderBy(col("h"), col("x"), col("y"))
  }

  /** Hybrid search via Reciprocal Rank Fusion
    * ([[graft.operators.Retrieval.rrfFusion]]): a lexical run (TOKEN-
    * KEYED distinct-token overlap — the inverted-index join shape, so
    * the cost is corpus-tokens × per-token query hits, never a
    * queries × corpus product; a doc sharing no token is simply not
    * retrieved, exactly like a posting-list scan) and a vector run
    * (exact cosine top-20, q27 convention) fused at k = 60 — no score
    * calibration across the two retrievers, the SIGIR 2009 recipe.
    * Every rank and the fusion arithmetic are deterministic, so the
    * oracle replays both runs and the merge exactly.
    */
  private def q141RrfFusion(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Retrieval, Similarity}
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
      .select(col("doc_id"),
        array_distinct(filter(split(lower(trim(col("text"))), " "),
          t => t =!= lit(""))).as("toks"))
    val queries = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"), col("toks").as("qtoks"))
    // inverted-index lexical run: corpus tokens shuffle once by token,
    // query tokens broadcast (bounded query set — the contract every
    // bounded-broadcast site in this codebase documents), overlap =
    // count of shared posting hits per (query, doc)
    val qtokens = queries.select(col("query_id"), explode(col("qtoks")).as("token"))
    val dtokens = docs.select(col("doc_id"), explode(col("toks")).as("token"))
    val lexical = dtokens.join(broadcast(qtokens), Seq("token"))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("overlap"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("overlap").desc, col("doc_id").asc)))
      .filter(col("rank") <= 20)
    val emb = t(s, dir, "embeddings")
    val vector = Similarity
      .bruteForceTopKAtScale(emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", 20)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine_sim").desc, col("neighbour_id").asc)))
      .select(col("query_id"), col("neighbour_id").as("doc_id"), col("rank"))
    Retrieval.rrfFusion(Seq(lexical.select("query_id", "doc_id", "rank"), vector),
        "query_id", "doc_id", "rank", k = 60, topN = 10)
      .select(col("query_id"), col("fused_rank").cast("long").as("fused_rank"),
        col("doc_id"), round(col("rrf_score"), 6).as("rrf_score"), col("n_runs"))
      .orderBy(col("query_id"), col("fused_rank"))
  }

  /** Topic labels for embedding clusters
    * ([[graft.operators.Scoring.clusterLabels]]): q43's deterministic
    * reference-centroid assignment joined back to document text, each
    * cluster labeled by its doc-frequency-lift top tokens — the
    * catalog step that turns opaque cell ids into auditable themes.
    * Assignment, counts, lift and ranks are all deterministic, so the
    * oracle replays the whole pipeline.
    */
  private def q142ClusterLabels(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Scoring, Similarity}
    val emb = t(s, dir, "embeddings")
    val centroids = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val assign = Similarity.ivfAssign(emb, "vec_id", "embedding",
        centroids, "cid", "cvec")
      .select(col("vec_id"), col("cell"))
    Scoring.clusterLabels(assign, "vec_id", "cell",
        t(s, dir, "documents"), "doc_id", "text", topN = 5, minDocs = 3)
      .select(col("cluster"), col("lift_rank").cast("long").as("lift_rank"),
        col("token"), col("df_c"), round(col("lift"), 6).as("lift"))
      .orderBy(col("cluster"), col("lift_rank"))
  }

  /** Session-path mining ([[graft.operators.Funnel.sessionPaths]]):
    * 30-minute-gap sessionization + whole-journey frequency counts —
    * the path-level complement to q100's one-step Markov matrix. All
    * orderings tie-break on event_id, so the oracle replays
    * gaps-and-islands, ordered path assembly and the top-20 exactly.
    */
  private def q143SessionPaths(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Funnel
    val ev = Tables.withEventTime(t(s, dir, "events"))
    Funnel.sessionPaths(ev, "user_id", "ts", "event_type", "event_id", topK = 20)
      .orderBy(col("n_sessions").desc, col("path").asc)
  }

  /** Rolling 7-day active users off the daily bitmap sketch table
    * ([[graft.operators.Sketches.rollingDistinct]]): every trailing
    * window is a union of ≤ 7 KB-sized day sketches — the fact table
    * is scanned once for any window length, where the naive
    * range-join re-shuffles it per window day. Exact, so the oracle
    * is the plain rolling COUNT(DISTINCT).
    */
  private def q144RollingMau(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sketches
    val ev = Tables.withEventTime(t(s, dir, "events"))
      .filter(col("user_id").isNotNull)
    val shards = Sketches.bitmapShards(ev,
      Seq(to_date(col("event_time")).as("day")), col("user_id"))
    Sketches.rollingDistinct(shards, "day", windowDays = 7)
      .select(col("day"), col("n_distinct"))
      .orderBy(col("day"))
  }

  /** Weekly cohort retention matrix
    * ([[graft.operators.Sketches.cohortRetention]]): first-activity
    * week defines each user's cohort; every (cohort × week-offset)
    * cell is one KB-sized bitmap intersection — q127's retention
    * generalized to the full product-analytics triangle, with no
    * per-cell re-scan. Exact, so the oracle is the plain
    * membership-join COUNT(DISTINCT) matrix.
    */
  private def q145CohortMatrix(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sketches
    val ev = Tables.withEventTime(t(s, dir, "events"))
      .filter(col("user_id").isNotNull)
      .withColumn("week", date_trunc("week", col("event_time")).cast("date"))
    Sketches.cohortRetention(ev, "user_id", "week", periodDays = 7, maxOffset = 4)
      .orderBy(col("cohort"), col("week_offset"))
  }

  /** Conversion-lag percentiles
    * ([[graft.operators.Funnel.conversionLag]]): time from first view
    * to the greedy-earliest purchase completion for q84's converters,
    * in exact microseconds with exact-interpolated percentiles — the
    * funnel COUNT turned into an SLA. The oracle restates the
    * strict-min chaining CTEs (the q84 convention) and quantile_cont.
    */
  private def q146ConversionLag(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Funnel
    val ev = Tables.withEventTime(t(s, dir, "events"))
    Funnel.conversionLag(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .select(col("n_converters"),
        round(col("p50_us"), 6).as("p50_us"),
        round(col("p90_us"), 6).as("p90_us"),
        col("max_us"))
  }

  /** Exact substring dedup ([[graft.operators.Dedup.duplicateSpans]],
    * the Lee et al. 2022 ExactSubstr shape): maximal character spans
    * whose every 20-char window repeats somewhere in the corpus — the
    * arbitrary-length dedup rung between q65's fixed-token spans and
    * q116's whole lines. Gram hashing, occurrence counting and the
    * gaps-and-islands merge are all deterministic, so the oracle
    * replays the pipeline verbatim (substr + md5 + row_number).
    */
  private def q147SubstringDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    Dedup.duplicateSpans(t(s, dir, "documents"), "doc_id", "text", minLen = 20)
      .select(col("id").as("doc_id"), col("span_start"), col("span_end"),
        col("span_len"))
      .orderBy(col("doc_id"), col("span_start"))
  }

  /** The ExactSubstr CUT step ([[graft.operators.Dedup.cutSpans]]) over
    * q147's duplicated spans with the drop-all-copies policy — the
    * decontamination-grade surgery that turns the span REPORT into a
    * cleaned corpus. Splice arithmetic is deterministic, so the oracle
    * replays span detection, the gap/tail reconstruction, and both
    * accounting columns exactly.
    */
  private def q151SubstringCut(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    val docs = t(s, dir, "documents")
    val spans = Dedup.duplicateSpans(docs, "doc_id", "text", minLen = 20)
    Dedup.cutSpans(docs, "doc_id", "text", spans)
      .select(col("id").as("doc_id"), md5(col("text_clean")).as("clean_md5"),
        col("n_spans"), col("chars_removed"))
      .orderBy(col("doc_id"))
  }

  /** The full FAISS IVFPQ search pipeline
    * ([[graft.operators.Pq.ivfPqTopK]]): coarse cells (the q142
    * lowest-id centroid convention), RESIDUAL PQ codes per member,
    * ADC over only the 4 probed cells' codes per query, exact re-rank
    * of the 128 survivors — the architecture that at 100 TB scans a
    * compressed fraction of the corpus instead of raw vectors.
    * Training is engine-side, so the q122 banded pattern applies:
    * DuckDB restates the exact L2 top-10 id-list md5, `recall_ok`
    * asserts ≥ 0.7 recall through BOTH approximation layers (cell
    * probing and PQ), asserted TRUE.
    */
  private def q152IvfPq(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Pq
    val emb = t(s, dir, "embeddings")
    val centroids = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val queries = emb.filter(col("vec_id") < 5)
    val hits = Pq.ivfPqTopK(queries, emb, "vec_id", "embedding",
        centroids, "cid", "cvec", m = 8, ksub = 16, iters = 5,
        k = 10, nProbe = 4, shortlist = 128)
      .select(col("query_id"), col("neighbor_id"))
    bandedRecallVsExactL2(emb, queries, hits, hitFloor = 7)
  }

  /** Outer purchase attribution — q48's interval join as LEFT OUTER
    * ([[graft.streaming.EventStreams.purchaseAttribution]] with
    * `left_outer`): every purchase, attributed view or not; null
    * `view_id` rows are the conversions with no marketing touch in the
    * lookback, the number a channel-mix dashboard reads next to q48's
    * attributed set. Same streaming-legal shape (both sides
    * watermarked; outer rows emit when the watermark closes the
    * window); the batch oracle is the plain LEFT JOIN restatement.
    */
  private def q156UnattributedPurchases(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.EventStreams
    val ev = EventStreams.withEventTime(t(s, dir, "events"))
    EventStreams.purchaseAttribution(ev, "30 minutes", "left_outer")
      .select(col("purchase_id"), col("view_id"), col("user_id"),
        round(col("value"), 4).as("purchase_value"))
      .orderBy(col("purchase_id"), col("view_id"))
  }

  /** Content-defined chunking
    * ([[graft.operators.Chunking.contentDefinedChunks]], the
    * FastCDC/gear-hash base form, window 8 / modulus 64 ⇒ ~64-char
    * expected chunks): boundaries fall where windowed content hashes
    * hit the modulus condition, so edits shift ONE chunk instead of
    * re-aligning every fixed-width chunk after them — the chunk
    * fingerprints downstream chunk-level dedup joins on. Hash rule and
    * segment assembly are exact arithmetic the oracle replays verbatim
    * (q130's hash-prefix convention).
    */
  private def q157CdcChunks(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Chunking
    Chunking.contentDefinedChunks(t(s, dir, "documents"), "doc_id", "text",
        window = 8, modulus = 64)
      .select(col("id").as("doc_id"), col("chunk_idx"), col("chunk_start"),
        col("chunk_len"), col("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Record linkage under transposition noise
    * ([[graft.operators.FuzzyJoin.jaroWinklerLinkage]]): every customer
    * name deterministically corrupted by an adjacent-digit swap at
    * position `10 + key % 8` (the typo/OCR error model Jaro's
    * transposition term exists for), then matched back to the clean
    * roster — sorted-character blocking (provably lossless for swap
    * noise), codegen'd DuckDB-parity [[graft.expressions.JaroWinkler]]
    * scoring, top-1 per dirty record by ppm-quantized score with id
    * tie-break. Anagram customers (same digit multiset) make real
    * ambiguity: when the swap lands on the last two digits the corrupt
    * form IS another customer's clean name and linkage correctly
    * prefers the exact hit — the oracle replays blocking, DuckDB's own
    * `jaro_winkler_similarity`, quantization, and the tie-break.
    */
  private def q158RecordLinkage(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.FuzzyJoin
    val cust = t(s, dir, "customer")
    val dirty = cust.select(col("c_custkey").as("dirty_id"),
      expr("""concat(substr(c_name, 1, cast(10 + c_custkey % 8 as int) - 1),
             |       substr(c_name, cast(10 + c_custkey % 8 as int) + 1, 1),
             |       substr(c_name, cast(10 + c_custkey % 8 as int), 1),
             |       substr(c_name, cast(10 + c_custkey % 8 as int) + 2))""".stripMargin)
        .as("dirty_name"))
    FuzzyJoin.jaroWinklerLinkage(dirty, "dirty_id", "dirty_name",
        cust, "c_custkey", "c_name", minScorePpm = 850000L)
      .orderBy(col("dirty_id"))
  }

  /** Leakage-safe train/val/test split
    * ([[graft.operators.Sampling.leakageSafeSplit]]): near-dup clusters
    * (q49's classed-Jaccard components) assign splits by cluster
    * REPRESENTATIVE, so no near-duplicate pair ever straddles
    * train/test — the contamination a plain per-doc hash split (q45)
    * silently permits. Doc-level output pins every assignment; the
    * oracle recomputes components via recursive SQL and replays the
    * md5 bucket arithmetic on the representative.
    */
  private def q159LeakageSafeSplit(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Dedup, Sampling}
    val docs = t(s, dir, "documents")
    val clusters = Dedup.dedupClustersClassed(docs, "doc_id", "text", "lang", 0.8)
    Sampling.leakageSafeSplit(docs, "doc_id", clusters,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select(col("doc_id"), col("rep_id"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** Key-skew profile over the events stream's user key
    * ([[graft.operators.SkewJoins.keySkewProfile]]) — the top-50
    * heaviest keys with row share and the salt factor a salted join
    * would need. All integer arithmetic (ppm shares and ceil via `div`)
    * restated verbatim by the oracle.
    */
  private def q160KeySkewProfile(s: SparkSession, dir: String): DataFrame =
    graft.operators.SkewJoins.keySkewProfile(t(s, dir, "events"), "user_id", 50)

  /** Stupid Backoff trigram scoring
    * ([[graft.operators.Scoring.stupidBackoff]]): model fit on the 90%
    * hash-train partition, the held-out 10% scored with real backoff
    * traffic (unseen trigrams fall to α-discounted bigrams, unigrams,
    * then the OOV floor). The oracle rebuilds all three count tables
    * and replays the backoff CASE, the α arithmetic (explicit DOUBLE
    * casts so DuckDB's decimal literals don't diverge from JVM
    * doubles), and the mean negative log2.
    */
  private def q161StupidBackoff(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Sampling, Scoring}
    val docs = t(s, dir, "documents")
    val train = docs.filter(Sampling.hashBucket(col("doc_id")) < 9000)
    val heldOut = docs.filter(Sampling.hashBucket(col("doc_id")) >= 9000)
    Scoring.stupidBackoff(train, heldOut, "doc_id", "text")
      .select(col("doc_id"), col("n_trigrams"),
        round(col("sb_cost"), 6).as("sb_cost"))
      .orderBy(col("doc_id"))
  }

  /** Explicit language-mixture rebalance
    * ([[graft.operators.Sampling.mixtureRebalance]]): the corpus
    * re-mixed to stated ppm shares (en 40%, zh 25%, de 15%, fr 12%,
    * es 8%) at constant total size — zh upsamples (n_copies ≥ 1 with
    * hash-spread extras), en downsamples (n_copies ∈ {0,1}). Row-level
    * output pins every copy count; integer arithmetic restated
    * verbatim by the oracle.
    */
  private def q162MixtureRebalance(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.mixtureRebalance(t(s, dir, "documents"),
        "doc_id", "lang",
        Seq("en" -> 400000L, "zh" -> 250000L, "de" -> 150000L,
          "fr" -> 120000L, "es" -> 80000L))
      .select(col("doc_id"), col("lang"), col("n_copies"))
      .orderBy(col("doc_id"))

  /** Perceptual dHash over the synthetic BMP corpus
    * ([[graft.operators.Multimodal.imageDHash]]): real 24-bit BMP
    * decode → 9×8 integer-luma grid → 64 difference bits, rendered as
    * hex. Everything is integer arithmetic over the known pixel
    * generator, so the oracle reconstructs every bit from the closed
    * form (the q134 pattern, hardened from means to exact bits).
    */
  private def q163ImageDhash(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.imageDHash(Multimodal.synthesize(s, 300))
      .orderBy(col("media_id"))
  }

  /** dHash brightness invariance ([[graft.operators.Multimodal]]):
    * every image hashed twice — raw and channel-shifted by +24
    * (clamped at 255) — and the per-image hamming distance between the
    * two hashes. The difference structure cancels a constant shift, so
    * hamming is 0 except where clamping at white actually bends a
    * comparison; the oracle replays the clamp and recounts differing
    * bits directly.
    */
  private def q164DhashInvariance(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val media = Multimodal.synthesize(s, 300)
    val a = Multimodal.imageDHashRaw(media, delta = 0)
      .withColumnRenamed("dhash64", "h0")
    val b = Multimodal.imageDHashRaw(media, delta = 24)
      .withColumnRenamed("dhash64", "h24")
    a.join(b, "media_id")
      .select(col("media_id"),
        expr("bit_count(h0 ^ h24)").cast("long").as("hamming"))
      .orderBy(col("media_id"))
  }

  /** ORC round-trip ([[graft.sources.Tables.writeOrc]]/`orc`): orders
    * written to ORC and read back through Spark's vectorized ORC
    * reader, then aggregated — the oracle computes the same aggregate
    * straight from the PARQUET table, so a hash match pins cross-FORMAT
    * content equality (types, nulls, row set), not just that the write
    * didn't crash. The sink path is per-SF so Verify and Bench never
    * collide.
    */
  private def q165OrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Tables
    val path = s"/tmp/graft_orc_rt/${dir.replaceAll("[^0-9a-zA-Z.]", "_")}/orders"
    Tables.writeOrc(t(s, dir, "orders"), path)
    Tables.orc(s, path)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"),
        countDistinct(col("o_custkey")).as("n_customers"))
      .orderBy(col("o_orderstatus"))
  }

  /** Bot-rate gate over the event stream: per user, the peak number of
    * events inside ANY sliding 24-hour window (RANGE frame over epoch
    * seconds — the q76 rolling machinery pointed at abuse detection)
    * plus the total event count, flagged when the burst exceeds the
    * rate threshold (9/day trips 11 of 150 users at sf0.01 — both flag
    * values carry real population). The oracle replays the identical
    * RANGE window in DuckDB over integer epoch seconds.
    */
  private def q166BotRateGate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // `div`, not `/`: ns magnitudes overflow double-precision exactness
    val ev = Tables.withEventTime(t(s, dir, "events"))
      .select(col("user_id"), expr("ts div 1000000000").as("sec"))
    val w = Window.partitionBy("user_id").orderBy("sec")
      .rangeBetween(-86399, Window.currentRow)
    ev.withColumn("burst", count(lit(1)).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), max("burst").as("max_burst_24h"))
      .withColumn("bot_flag", (col("max_burst_24h") >= 9).cast("boolean"))
      .orderBy(col("user_id"))
  }

  /** Matryoshka truncation evaluation: exact cosine top-10 under the
    * full 64-dim embedding vs exact top-10 under the first 16 dims
    * (the MRL deployment question — how much recall does a 4×-cheaper
    * prefix keep?). Output: per query, the overlap count of the two
    * neighbour sets — pure integers once both exact top-10s are fixed,
    * and the oracle recomputes both rankings with DuckDB list slicing.
    */
  private def q167MatryoshkaRecall(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    val full = Similarity.bruteForceTopKAtScale(queries, emb, "vec_id", "embedding", 10)
      .select(col("query_id"), col("neighbour_id"))
    val trunc = Similarity.bruteForceTopKAtScale(
        queries.withColumn("embedding", slice(col("embedding"), 1, 16)),
        emb.withColumn("embedding", slice(col("embedding"), 1, 16)),
        "vec_id", "embedding", 10)
      .select(col("query_id"), col("neighbour_id"))
    full.join(trunc, Seq("query_id", "neighbour_id"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("hits_at_10"))
      .orderBy(col("query_id"))
  }

  /** Time travel ([[graft.sources.VersionedTable]]): orders committed as
    * two snapshots (v0 = sub-100k orders, v1 = everything), then BOTH
    * read back — v0 by pinned version, v1 as latest — and aggregated.
    * The oracle recomputes both aggregates straight from parquet, so a
    * hash match pins the whole commit/marker/resolve protocol end to
    * end: staging rename, marker visibility, version resolution. The
    * table root is wiped first so reruns are idempotent.
    */
  private def q168TimeTravel(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.VersionedTable
    val path = s"/tmp/graft_vtable/${dir.replaceAll("[^0-9a-zA-Z.]", "_")}/orders"
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val orders = t(s, dir, "orders")
    VersionedTable.write(s, orders.filter(col("o_totalprice") < 100000), path)
    VersionedTable.write(s, orders, path)
    def snap(df: DataFrame, v: Int): DataFrame =
      df.agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total_price"))
        .select(lit(v.toLong).as("version"), col("n_orders"), col("total_price"))
    snap(VersionedTable.read(s, path, Some(0L)), 0)
      .unionByName(snap(VersionedTable.read(s, path), 1))
      .orderBy(col("version"))
  }

  /** k-anonymity audit ([[graft.operators.Validation.kAnonymityAudit]])
    * over customer quasi-identifiers (nation, market segment): every
    * equivalence class with its size and the k=5 violation flag — the
    * release-gating table. Trivial SQL by design; the operator's value
    * is the generic policy surface.
    */
  private def q169KAnonymity(s: SparkSession, dir: String): DataFrame =
    graft.operators.Validation.kAnonymityAudit(t(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"), k = 5)
      .orderBy(col("c_nationkey"), col("c_mktsegment"))

  /** Hashing-trick features ([[graft.operators.Scoring.hashedFeatures]]):
    * signed 256-bucket token features over the q50 doc slice — the
    * vocabulary-free featurizer, every bucket and sign restated by the
    * oracle from the same md5 arithmetic.
    */
  private def q170HashedFeatures(s: SparkSession, dir: String): DataFrame =
    graft.operators.Scoring.hashedFeatures(
        t(s, dir, "documents").filter(col("doc_id") < 2000), "doc_id", "text", 256)
      .orderBy(col("doc_id"), col("bucket"))

  /** Corpus datacard ([[graft.pipeline.CorpusCuration.dataCard]]): the
    * per-language release summary — volume, shape, and near-dup
    * hygiene in one exact-aggregate table, every cell restated by the
    * oracle (token stats in SQL, dup membership via the recursive q49
    * component machinery's pair set).
    */
  private def q171Datacard(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.CorpusCuration.dataCard(
        t(s, dir, "documents"), "doc_id", "text", "lang")
      .orderBy(col("lang"))

  /** Referential-integrity audit
    * ([[graft.operators.Validation.refIntegrityAudit]]) over the star
    * schema's FK spine plus the events→customer linkage: child counts,
    * orphan counts, pass flags. The generator is consistent, so every
    * row reads ok=true — the AUDIT's arithmetic is what the oracle
    * pins; ValidationSpec wires a fixture with real orphans.
    */
  private def q172RefIntegrity(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Validation.{RefCheck, refIntegrityAudit}
    refIntegrityAudit(Seq(
      RefCheck("customer.c_nationkey->nation", t(s, dir, "customer"),
        "c_nationkey", t(s, dir, "nation"), "n_nationkey"),
      RefCheck("events.user_id->customer", t(s, dir, "events"),
        "user_id", t(s, dir, "customer"), "c_custkey"),
      RefCheck("lineitem.l_orderkey->orders", t(s, dir, "lineitem"),
        "l_orderkey", t(s, dir, "orders"), "o_orderkey"),
      RefCheck("orders.o_custkey->customer", t(s, dir, "orders"),
        "o_custkey", t(s, dir, "customer"), "c_custkey")))
      .orderBy(col("fk"))
  }

  /** GDPR erasure ([[graft.pipeline.Erasure.erase]]): every customer
    * whose key ends in 07 exercises the right to be forgotten; customer
    * and orders are rewritten without them as committed
    * [[graft.sources.VersionedTable]] snapshots and the audit table —
    * before/erased/after/version per table — is the query output. The
    * oracle restates the erasure arithmetic; the versioned commit is
    * deterministic (version 0 on a clean root).
    */
  private def q173GdprErase(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.Erasure
    val path = s"/tmp/graft_gdpr/${dir.replaceAll("[^0-9a-zA-Z.]", "_")}"
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val cust = t(s, dir, "customer")
    val subjects = cust.filter(col("c_custkey") % 100 === 7)
    Erasure.erase(s, subjects, "c_custkey", Seq(
        Erasure.Scope("customer", cust, "c_custkey"),
        Erasure.Scope("orders", t(s, dir, "orders"), "o_custkey")), path)
      .orderBy(col("table_name"))
  }

  /** Asymmetric containment pairs
    * ([[graft.operators.Dedup.containmentPairs]]): both directional
    * containments over distinct word-2-gram shingles, blocked by lang,
    * kept where either direction ≥ 0.4 — Broder '97's second measure,
    * the one that catches a short document embedded verbatim in a long
    * one (resemblance misses it; MinHash cannot estimate it). The
    * oracle restates the shingle inverted index and both ratios in SQL.
    */
  private def q174ContainmentPairs(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
        "lang", n = 2, threshold = 0.4)
      .select(col("id_a"), col("id_b"),
        round(col("cont_a"), 6).as("cont_a"),
        round(col("cont_b"), 6).as("cont_b"),
        round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Containment-dedup survivor set
    * ([[graft.operators.Dedup.containmentDedup]]): documents whose
    * 2-gram shingle set is ≥ 0.4 contained in a larger document are
    * dropped per qualifying edge (containment is not transitive — no
    * component collapse), exact-size ties dropping the larger id. The
    * oracle replays the edge-side drop rule over the q174 pair SQL.
    */
  private def q175ContainmentDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    Dedup.containmentDedup(t(s, dir, "documents"), "doc_id", "text",
        "lang", n = 2, threshold = 0.4)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Leave-one-out target encoding
    * ([[graft.operators.Features.targetEncodeLoo]]): each order's
    * priority encoded as the mean total price of the OTHER orders with
    * that priority — the leakage-safe target statistic. The target is
    * pre-scaled to integer cents so the category sums are exact longs
    * (order-independent, bit-identical across engines); the oracle
    * restates the window-sum form of the same arithmetic.
    */
  private def q176TargetEncoding(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Features
    val orders = t(s, dir, "orders")
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
    Features.targetEncodeLoo(orders, "o_orderkey", "o_orderpriority", "cents")
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(col("loo_enc") / 100.0, 6).as("loo_enc"))
      .orderBy(col("o_orderkey"))
  }

  /** Fitted equi-depth binning
    * ([[graft.operators.Features.quantileBins]]): 8 bins over order
    * total price — the K−1 breakpoints fit once (exact interpolated
    * percentiles, the q09 quantile_cont parity precedent), broadcast,
    * and applied map-side; the per-bin histogram pins both the fit and
    * the (lo, hi] boundary convention against DuckDB.
    */
  private def q177QuantileBins(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Features
    Features.quantileBins(t(s, dir, "orders"), "o_totalprice", 8)
      .groupBy(col("bin").cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 2).as("min_price"),
        round(max(col("o_totalprice")), 2).as("max_price"))
      .orderBy(col("bin"))
  }

  /** Mutual information between order priority and status
    * ([[graft.operators.Scoring.mutualInformation]]): the contingency
    * table is cell-sized (15 cells) whatever the corpus size; the
    * oracle restates the Σ p(x,y)·ln(p(x,y)/(p(x)p(y))) sum exactly.
    */
  private def q178MutualInfo(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Scoring
    Scoring.mutualInformation(t(s, dir, "orders"),
        "o_orderpriority", "o_orderstatus")
      .select(col("n"), col("n_cells"), round(col("mi"), 6).as("mi"))
  }

  /** Benford first-digit audit ([[graft.operators.Drift.benfordAudit]])
    * of order totals: leading digit of the integer part (string route —
    * engine-portable, no float formatting or log-near-integer boundary)
    * vs log10(1 + 1/d), with per-digit chi-square contributions.
    */
  private def q179BenfordAudit(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Drift
    Drift.benfordAudit(t(s, dir, "orders"), "o_totalprice")
      .select(col("digit"), col("n"),
        round(col("observed_p"), 6).as("observed_p"),
        round(col("expected_p"), 6).as("expected_p"),
        round(col("chi2_term"), 6).as("chi2_term"))
      .orderBy(col("digit"))
  }

  /** A/B gate ([[graft.operators.Funnel.abTestGate]]): users hash-split
    * into two variants by user_id parity, the experiment unit is the
    * USER-DAY (daily exposure; converts if that day saw a purchase —
    * per-user "ever purchased" saturates to pool = 1 on this corpus and
    * has no variance to test); the pooled two-proportion z-test as one
    * row of exact arithmetic the oracle restates verbatim.
    */
  private def q180AbTest(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Funnel
    val ev = Tables.withEventTime(t(s, dir, "events"))
      .filter(col("user_id").isNotNull)
      .withColumn("unit",
        concat_ws("|", col("user_id"), to_date(col("event_time"))))
      .withColumn("variant", (col("user_id") % 2).cast("long"))
    Funnel.abTestGate(ev, "unit", "variant", "event_type", "purchase")
      .select(col("variant_a"), col("variant_b"), col("n_a"), col("n_b"),
        col("conv_a"), col("conv_b"),
        round(col("p_a"), 6).as("p_a"), round(col("p_b"), 6).as("p_b"),
        round(col("z"), 6).as("z"), col("significant"))
  }

  /** Chao1 unseen-vocabulary estimate
    * ([[graft.operators.CorpusStats.chao1]]): observed types plus the
    * bias-corrected singleton/doubleton estimator — "does more crawling
    * still buy new vocabulary". One tokenize+aggregate pass to a
    * vocabulary-sized table, then constant arithmetic.
    */
  private def q181Chao1(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.CorpusStats
    CorpusStats.chao1(t(s, dir, "documents"), "text")
      .select(col("n_tokens"), col("vocab"), col("f1"), col("f2"),
        round(col("chao1"), 6).as("chao1"))
  }

  /** Zipf power-law fit ([[graft.operators.CorpusStats.zipfSlope]]):
    * OLS slope of ln freq on ln rank over the top-100 ranks — natural
    * text sits near −1; template corpora go flat. Top-k via
    * TakeOrdered (distributed), rank window over 100 rows only.
    */
  private def q182ZipfSlope(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.CorpusStats
    CorpusStats.zipfSlope(t(s, dir, "documents"), "text", topN = 100)
      .select(col("n_ranks"), round(col("slope"), 6).as("slope"),
        round(col("intercept"), 6).as("intercept"))
  }

  /** Gini concentration of corpus volume over sources
    * ([[graft.operators.CorpusStats.giniConcentration]]): the
    * diversity-risk number the mixture-rebalance family acts on;
    * rank-form Gini over the group-sized share table.
    */
  private def q183GiniSources(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.CorpusStats
    CorpusStats.giniConcentration(t(s, dir, "documents"), "source")
      .select(col("n_groups"), col("total"), round(col("gini"), 6).as("gini"))
  }

  /** Poisson-bootstrap CI of mean order value
    * ([[graft.operators.Stats.poissonBootstrapCI]]): 200 deterministic
    * Poisson(1)-weighted replicates (Chamandy '12 — the bootstrap that
    * needs no global coordination), percentile CI over the replicate
    * means. The target is pre-scaled to integer cents so every
    * replicate sum is exact (order-independent); the oracle replays
    * the md5 CDF-ladder draws and both percentiles.
    */
  private def q184BootstrapCi(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Stats
    val orders = t(s, dir, "orders")
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
    Stats.poissonBootstrapCI(orders, "o_orderkey", "cents", nReplicates = 200)
      .select(col("n"), round(col("point_mean") / 100.0, 6).as("point_mean"),
        col("n_replicates"),
        round(col("ci_lo") / 100.0, 6).as("ci_lo"),
        round(col("ci_hi") / 100.0, 6).as("ci_hi"))
  }

  /** Cohen's kappa ([[graft.operators.Stats.cohensKappa]]): agreement
    * between the order status and a deterministically perturbed second
    * annotator (every 10th key relabeled 'O') — the label-quality gate;
    * κ from one cell-sized contingency aggregate.
    */
  private def q185CohensKappa(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Stats
    val labeled = t(s, dir, "orders")
      .withColumn("rater_b",
        when(col("o_orderkey") % 10 === 0, lit("O"))
          .otherwise(col("o_orderstatus")))
    Stats.cohensKappa(labeled, "o_orderstatus", "rater_b")
      .select(col("n"), round(col("po"), 6).as("po"),
        round(col("pe"), 6).as("pe"), round(col("kappa"), 6).as("kappa"))
  }

  /** Exact-k weighted sample without replacement
    * ([[graft.operators.Sampling.weightedSampleExactK]], Efraimidis-
    * Spirakis A-Res): exactly 50 documents drawn with probability
    * tracking n_chars — deterministic md5 uniforms, ln(u)/w order
    * statistic quantized to 10 dp, one TakeOrdered; the corpus never
    * shuffles. The oracle replays the draw and the top-k.
    */
  private def q186WeightedTopK(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    Sampling.weightedSampleExactK(t(s, dir, "documents"), "doc_id",
        col("n_chars"), k = 50)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Per-segment metric trend ([[graft.operators.GroupOps.trendSlopes]]):
    * OLS slope of event value on day index per event type — "is this
    * metric drifting, how fast, where". x is centered at 2024-01-01:
    * epoch-day magnitudes would make n·Σx²−(Σx)² catastrophically
    * cancel and no 6-dp cross-engine parity could survive; centered,
    * the sums are benign and DuckDB restates them exactly.
    */
  private def q187TrendSlopes(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.GroupOps
    val ev = Tables.withEventTime(t(s, dir, "events"))
      .filter(col("value").isNotNull)
      .withColumn("day_idx",
        datediff(to_date(col("event_time")), lit("2024-01-01").cast("date")))
    GroupOps.trendSlopes(ev, Seq("event_type"), "day_idx", "value")
      .select(col("event_type"), col("n"),
        round(col("slope"), 6).as("slope"),
        round(col("intercept"), 6).as("intercept"))
      .orderBy(col("event_type"))
  }

  /** MMR diversification ([[graft.operators.Retrieval.mmrDiversify]],
    * Carbonell-Goldstein '98): exact top-10 cosine candidates per query
    * (5 queries), greedily re-ranked to 5 diverse results at λ = 0.7.
    * The greedy rounds are pure max/compare over 6-dp-quantized cosines
    * (q26's parity bound) with 9-dp score quantization, so the oracle
    * unrolls the same five argmax rounds in SQL and hash-matches.
    */
  private def q188MmrDiversify(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Retrieval, Similarity}
    val emb = t(s, dir, "embeddings")
    val cands = Similarity
      .bruteForceTopK(emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", 10)
      .join(emb.select(col("vec_id").as("neighbour_id"), col("embedding")),
        Seq("neighbour_id"))
    // mmr_score stays at the operator's 9-dp quantization: re-rounding
    // a quantized decimal to fewer places parks ~10% of values exactly
    // on the half boundary, where engines' round implementations
    // legitimately disagree (double-rounding hazard)
    Retrieval.mmrDiversify(cands, "query_id", "neighbour_id", "cosine_sim",
        "embedding", lambda = 0.7, k = 5)
      .select(col("query_id"), col("mmr_rank"),
        col("neighbour_id").as("doc_id"), col("mmr_score"))
      .orderBy(col("query_id"), col("mmr_rank"))
  }

  /** JSONL round-trip ([[graft.sources.Tables.writeJsonLines]]/
    * `jsonLines`): documents exported to JSON-lines (the release
    * interchange format) and read back with a pinned schema, then
    * aggregated — the oracle aggregates the PARQUET table, so a hash
    * match pins cross-format content equality (q165's ORC pattern).
    */
  private def q189JsonlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Tables
    val base = t(s, dir, "documents")
    val path = s"/tmp/graft_jsonl_rt/${dir.replaceAll("[^0-9a-zA-Z.]", "_")}/documents"
    Tables.writeJsonLines(base, path)
    Tables.jsonLines(s, path, base.schema)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
      .orderBy(col("lang"), col("source"))
  }

  /** ε-DP count release ([[graft.operators.Validation.dpNoisedCounts]]):
    * order counts by (priority, status) published with deterministic
    * Laplace(1/ε) noise — re-releases are byte-identical (an observer
    * can't average fresh noise away) and the oracle replays the md5
    * inverse-CDF draw and the noise arithmetic exactly.
    */
  private def q190DpCounts(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Validation
    Validation.dpNoisedCounts(t(s, dir, "orders"),
        Seq("o_orderpriority", "o_orderstatus"), epsilon = 1.0)
      .orderBy(col("o_orderpriority"), col("o_orderstatus"))
  }

  /** Incremental join maintenance
    * ([[graft.operators.Incremental.joinDelta]]): orders/customer each
    * split into a 95% snapshot and a 5% append; the operator emits the
    * join's NEW rows from delta-sized joins only — the oracle derives
    * the same rows from the FULL join filtered to pairs touching a
    * delta member, so the algebraic identity itself is what's checked.
    */
  private def q191DeltaJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Incremental
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey").as("custkey"))
    val c = t(s, dir, "customer").select(col("c_custkey").as("custkey"), col("c_nationkey"))
    Incremental.joinDelta(
        o.filter(col("o_orderkey") % 20 =!= 0), o.filter(col("o_orderkey") % 20 === 0),
        c.filter(col("custkey") % 25 =!= 0), c.filter(col("custkey") % 25 === 0),
        Seq("custkey"))
      .select(col("o_orderkey"), col("custkey"), col("c_nationkey"))
      .orderBy(col("o_orderkey"))
  }

  /** Rank-Biased Overlap ([[graft.operators.Retrieval.rankBiasedOverlap]],
    * Webber '10): agreement between the exact cosine run and the
    * token-overlap lexical run from q141's machinery, truncated at
    * k = 10, p = 0.9 — top-weighted, unlike set overlap. Exact
    * geometric arithmetic the oracle restates per depth.
    */
  private def q192Rbo(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Retrieval, Similarity}
    import org.apache.spark.sql.expressions.Window
    val emb = t(s, dir, "embeddings")
    val vector = Similarity
      .bruteForceTopK(emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", 10)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine_sim").desc, col("neighbour_id").asc)))
      .select(col("query_id"), col("neighbour_id").as("doc_id"), col("rank"))
    val docs = t(s, dir, "documents")
      .select(col("doc_id"),
        array_distinct(filter(split(lower(trim(col("text"))), " "),
          t => t =!= lit(""))).as("toks"))
    val queries = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"), explode(col("toks")).as("token"))
    val lexical = docs.select(col("doc_id"), explode(col("toks")).as("token"))
      .join(broadcast(queries), Seq("token"))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("overlap"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("overlap").desc, col("doc_id").asc)))
      .filter(col("rank") <= 10)
    Retrieval.rankBiasedOverlap(vector, lexical,
        "query_id", "doc_id", "rank", k = 10, p = 0.9)
      .select(col("query_id"), round(col("rbo"), 6).as("rbo"))
      .orderBy(col("query_id"))
  }

  /** Robust MAD outlier gate ([[graft.operators.GroupOps.madOutliers]],
    * Hampel '74): event values more than 5 MADs from their type's
    * median — the gate outliers can't corrupt, unlike mean±kσ. Exact
    * medians (q09 interpolation parity).
    */
  private def q193MadOutliers(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.GroupOps
    GroupOps.madOutliers(Tables.withEventTime(t(s, dir, "events")),
        Seq("event_type"), "event_id", "value", c = 5.0)
      .select(col("event_type"), col("event_id"),
        round(col("value"), 6).as("value"), round(col("med"), 6).as("med"),
        round(col("mad"), 6).as("mad"), round(col("robust_z"), 6).as("robust_z"))
      .orderBy(col("event_type"), col("event_id"))
  }

  /** RFM customer-value features ([[graft.operators.Funnel.rfmTable]]):
    * recency/frequency/monetary per customer from orders, quintile
    * scores via FITTED breakpoints (no entity-wide ntile window — the
    * q177 machinery, scale-correct at a billion entities). Monetary
    * sums exact integer cents.
    */
  private def q194RfmFeatures(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Funnel
    Funnel.rfmTable(t(s, dir, "orders"), "o_custkey", "o_orderdate",
        "o_totalprice", anchorDate = "1998-08-02")
      .select(col("o_custkey"), col("recency_days"), col("frequency"),
        round(col("monetary"), 2).as("monetary"),
        col("r_score"), col("f_score"), col("m_score"))
      .orderBy(col("o_custkey"))
  }

  /** Code-identifier tokenization
    * ([[graft.functions.TextFunctions.codeTokens]]): each document's
    * alpha tokens (length ≥ 2 — single letters camelCase into
    * unsplittable capital runs) are camelCased into one identifier and
    * the tokenizer must recover them exactly — the oracle asserts the
    * round-trip identity (count + joined md5), so any
    * boundary-splitting bug breaks the hash.
    */
  private def q195CodeTokens(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    val alpha = filter(split(lower(trim(col("text"))), "\\s+"),
      t => t.rlike("^[a-z]{2,}$"))
    val ident = concat_ws("",
      transform(alpha, t => initcap(t)))
    t(s, dir, "documents")
      .withColumn("__alpha", alpha)
      .withColumn("recovered", TextFunctions.codeTokens(ident))
      .select(col("doc_id"),
        size(col("__alpha")).cast("long").as("n_alpha"),
        size(col("recovered")).cast("long").as("n_recovered"),
        (col("recovered") === col("__alpha")).as("ok"),
        md5(concat_ws(" ", col("recovered"))).as("toks_md5"))
      .orderBy(col("doc_id"))
  }

  /** Semantic decontamination
    * ([[graft.operators.Similarity.semanticDecontaminate]]): training
    * vectors (vec_id ≥ 20) too close to any held-out eval vector
    * (vec_id < 20) at cosine ≥ 0.35 — the paraphrase-leakage
    * complement to q74's n-gram decontamination. Exact cosines, eval
    * side broadcast, per-train argmax windowed by train id.
    */
  private def q196SemanticDecontam(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val emb = t(s, dir, "embeddings")
    Similarity.semanticDecontaminate(
        emb.filter(col("vec_id") >= 20), emb.filter(col("vec_id") < 20),
        "vec_id", "embedding", threshold = 0.35)
      .select(col("vec_id"), col("eval_id"), round(col("cosine"), 6).as("cosine"))
      .orderBy(col("vec_id"))
  }

  /** MOSS winnowed-overlap pairs
    * ([[graft.operators.Dedup.winnowedOverlapPairs]]): documents
    * sharing ≥ 2 winnowing fingerprints (k = 3, w = 4) — the local
    * copied-paragraph detector; md5-portable winnowing replayed in
    * full by the oracle (gram hash, window minima, distinct set,
    * fingerprint join, pair counts).
    */
  private def q197WinnowedPairs(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    Dedup.winnowedOverlapPairs(t(s, dir, "documents"), "doc_id", "text",
        "lang", k = 3, w = 4, minShared = 2)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Sentence BLEU-4 over deterministic adjacent-doc pairs
    * ([[graft.operators.TextEval.bleu]]): each document scored as a
    * "candidate" against the next doc id in its source (lead window —
    * the SQL-replayable pair harness), with clipped n-gram counts
    * m1..m4 from the one-pass [[graft.expressions.NgramOverlapStats]]
    * kernel, Lin–Och add-one smoothing for n ≥ 2, and the brevity
    * penalty on unigram lengths. Map-side per pair — the whole metric
    * is a projection; the oracle replays grams, clipping, smoothing,
    * BP and the geometric mean in SQL.
    */
  private def q198Bleu(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextEval
    val pairs = TextEval.adjacentPairs(t(s, dir, "documents"), "doc_id", "text", "source")
    TextEval.bleu(pairs, "cand_text", "ref_text", maxN = 4)
      .select(col("cand_id"), col("ref_id"), col("c_len"), col("r_len"),
        col("m1"), col("m2"), col("m3"), col("m4"), col("bp"), col("bleu"))
      .orderBy(col("cand_id"))
  }

  /** ROUGE-1/ROUGE-2 precision/recall/F1 over the same adjacent-doc
    * pair harness ([[graft.operators.TextEval.rougeN]]): one row per
    * (pair, n) with the clipped overlap and both denominators — the
    * summarization-eval complement to q198's precision-side BLEU. Same
    * map-side kernel, one extra explode over the ≤2 per-order structs.
    */
  private def q199Rouge(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextEval
    val pairs = TextEval.adjacentPairs(t(s, dir, "documents"), "doc_id", "text", "source")
    TextEval.rougeN(pairs, "cand_text", "ref_text", ns = Seq(1, 2))
      .select(col("cand_id"), col("ref_id"), col("n"), col("overlap"),
        col("cand_total"), col("ref_total"),
        col("precision"), col("recall"), col("f1"))
      .orderBy(col("cand_id"), col("n"))
  }

  /** Micro-averaged corpus BLEU per source
    * ([[graft.operators.TextEval.corpusBleu]]): clipped counts and
    * totals summed across each source's adjacent pairs BEFORE the
    * precision ratios, corpus brevity penalty on the summed lengths —
    * the corpus-level number a generation pipeline gates on. All
    * aggregation over exact longs; the oracle replays sums, smoothing,
    * BP and the geometric mean.
    */
  private def q200CorpusBleu(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextEval
    TextEval.corpusBleu(t(s, dir, "documents"), "doc_id", "text", "source", maxN = 4)
      .orderBy(col("source"))
  }

  /** Self-BLEU per source ([[graft.operators.TextEval.selfBleu]]):
    * mean sentence BLEU over each source's adjacent pairs — the
    * corpus-diversity gauge (lower = more diverse). The mean is over
    * integer BLEU-micros so it is order-independent and the oracle
    * replays it exactly.
    */
  private def q201SelfBleu(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextEval
    TextEval.selfBleu(t(s, dir, "documents"), "doc_id", "text", "source", maxN = 4)
      .orderBy(col("source"))
  }

  /** PNG dHash ([[graft.operators.Multimodal.imageDHash]] over
    * [[graft.operators.Multimodal.synthesizeImages]] "png"): the SAME
    * closed-form pixels as q163's BMPs, but encoded as real PNGs and
    * decoded through the JDK's ImageIO. PNG is lossless, so the oracle
    * is q163's bit-for-bit closed-form reconstruction UNCHANGED — a
    * hash match pins the whole codec path (PNG encode → ImageIO decode
    * → luma pool → 64 difference bits) to the generator.
    */
  private def q202PngDhash(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.imageDHash(Multimodal.synthesizeImages(s, 300, "png"))
      .orderBy(col("media_id"))
  }

  /** JPEG perceptual stability ([[graft.operators.Multimodal]]): every
    * logical image hashed twice — losslessly (BMP byte path) and
    * through a real JPEG encode/decode round trip — and gated on
    * hamming <= 16 of 64 bits. dHash is DESIGNED to survive lossy
    * re-encodes; measured worst case on this corpus (mod-251 noise,
    * JPEG's hardest input) is 8 bits. The oracle pins the verdict
    * column (the q152 recall-verdict convention — codec output isn't
    * SQL-expressible, the engine must earn the TRUEs).
    */
  private def q203JpegDhashStability(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val ref = Multimodal.imageDHashRaw(Multimodal.synthesizeImages(s, 300, "bmp"))
      .withColumnRenamed("dhash64", "h_ref")
    val jpg = Multimodal.imageDHashRaw(Multimodal.synthesizeImages(s, 300, "jpeg"))
      .withColumnRenamed("dhash64", "h_jpeg")
    ref.join(jpg, "media_id")
      .select(col("media_id"),
        (expr("bit_count(h_ref ^ h_jpeg)") <= 16).as("within_16_bits"))
      .orderBy(col("media_id"))
  }

  /** PNG box-mean pooling ([[graft.operators.Multimodal.imagePool]]):
    * q134's 4×4 thumbnail kernel over PNG payloads decoded by ImageIO
    * — lossless, so every channel mean replays q134's closed-form
    * oracle exactly. Pins pooling through the codec path down to the
    * double.
    */
  private def q204PngPool(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.imagePool(Multimodal.synthesizeImages(s, 300, "png"), 4, 4).toDF()
      .select(col("mediaId").as("media_id"), col("cellX").as("cell_x"),
        col("cellY").as("cell_y"),
        round(col("rMean"), 4).as("r_mean"),
        round(col("gMean"), 4).as("g_mean"),
        round(col("bMean"), 4).as("b_mean"))
      .orderBy(col("media_id"), col("cell_y"), col("cell_x"))
  }

  /** chrF2 over the adjacent-pair harness
    * ([[graft.operators.TextEval.chrF]]): character n-gram
    * precision/recall macro-averaged over orders 1..6, recall-weighted
    * F (β = 2) — the tokenization-robust MT metric. Same map-side
    * kernel as BLEU with single characters as tokens; whitespace
    * stripped first. The oracle replays char grams, clipping, the
    * all-orders average, and the β-weighted F exactly.
    */
  private def q205Chrf(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextEval
    val pairs = TextEval.adjacentPairs(t(s, dir, "documents"), "doc_id", "text", "source")
    TextEval.chrF(pairs, "cand_text", "ref_text", maxN = 6, beta = 2.0)
      .select(col("cand_id"), col("ref_id"), col("c_chars"), col("r_chars"),
        col("chr_p"), col("chr_r"), col("chrf"))
      .orderBy(col("cand_id"))
  }

  /** ROUGE-L over the adjacent-pair harness
    * ([[graft.operators.TextEval.rougeL]]): LCS-based precision /
    * recall / F1 — the in-order skeleton metric completing the
    * generation-eval family (BLEU q198, ROUGE-N q199, corpus/self
    * q200/q201, chrF q205). The oracle replays the FULL LCS dynamic
    * program as a recursive anti-diagonal CTE (each diagonal depends
    * only on the two before it, so the whole diagonal is one
    * list_transform) and then the metric arithmetic.
    */
  private def q206RougeL(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextEval
    val pairs = TextEval.adjacentPairs(t(s, dir, "documents"), "doc_id", "text", "source")
    TextEval.rougeL(pairs, "cand_text", "ref_text", beta = 1.0)
      .select(col("cand_id"), col("ref_id"), col("c_len"), col("r_len"),
        col("lcs"), col("precision"), col("recall"), col("rouge_l"))
      .orderBy(col("cand_id"))
  }

  /** Word error rate over the adjacent-pair harness
    * ([[graft.operators.TextEval.wer]]): unit-cost token Levenshtein
    * distance over reference length — the transcription-quality gate.
    * The oracle replays the full edit-distance dynamic program with
    * the same recursive anti-diagonal CTE technique as q206's LCS
    * (min instead of max, +1 edit costs, j/i base rows).
    */
  private def q207Wer(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextEval
    val pairs = TextEval.adjacentPairs(t(s, dir, "documents"), "doc_id", "text", "source")
    TextEval.wer(pairs, "cand_text", "ref_text")
      .select(col("cand_id"), col("ref_id"), col("h_len"), col("r_len"),
        col("edits"), col("wer"))
      .orderBy(col("cand_id"))
  }

  /** One-scan generation-eval datacard
    * ([[graft.operators.TextEval.generationEvalSummary]]): per source,
    * the mean sentence BLEU-4, chrF2, ROUGE-L F1 and WER over the
    * adjacent pairs — all four metrics composed as projections over
    * the SAME pair row, so the whole datacard costs one corpus scan,
    * one window shuffle, one aggregate (vs four separate queries).
    * Means over integer metric-micros (exact, order-independent). The
    * oracle wraps the four per-pair metric oracles as CTEs and joins
    * them — every number is replayed end to end.
    */
  private def q208EvalRollup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextEval
    TextEval.generationEvalSummary(t(s, dir, "documents"), "doc_id", "text", "source")
      .orderBy(col("source"))
  }

  /** Unicode tokenizer degradation/round-trip pin
    * ([[graft.expressions.UnicodeTokens]] behind the
    * [[graft.functions.Tokenize]] seam): on the oracle corpus (pure
    * single-space ASCII) the UAX#29 tokenizer must degrade EXACTLY to
    * whitespace tokens — count, joined-tokens md5, and an engine-side
    * token-array equality verdict are all replayed by DuckDB, and
    * character conservation is pinned by md5 over the space-stripped
    * text. The CJK/Thai segmentation itself is not SQL-expressible;
    * it is spec-pinned by UnicodeTokensSpec's hand-segmented fixtures
    * (the q124/q195 oracle convention).
    */
  private def q209UnicodeTokens(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Tokenize
    graft.expressions.GraftFunctions.register(s)
    t(s, dir, "documents")
      .withColumn("__u", Tokenize.tokens(col("text"), Tokenize.Unicode))
      .select(col("doc_id"),
        size(col("__u")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("__u"))).as("toks_md5"),
        (col("__u") ===
          Tokenize.tokensSpaceSplit(col("text"), Tokenize.Whitespace)).as("ws_equal"),
        md5(concat_ws("", col("__u"))).as("chars_md5"))
      .orderBy(col("doc_id"))
  }

  /** Chao1 vocabulary estimate through the Unicode tokenizer seam
    * ([[graft.operators.CorpusStats.chao1]] with
    * [[graft.functions.Tokenize.Unicode]]): the q181 estimator with
    * the native UAX#29 tokenizer in place of whitespace split —
    * DuckDB replays the whole explode+aggregate path, pinning that
    * the seam is a drop-in (identical vocabulary on ASCII; real
    * vocabulary instead of whole clauses on CJK/Thai, spec-pinned).
    */
  private def q210UnicodeVocab(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.CorpusStats
    import graft.functions.Tokenize
    CorpusStats.chao1(t(s, dir, "documents"), "text", Tokenize.Unicode)
      .select(col("n_tokens"), col("vocab"), col("f1"), col("f2"),
        round(col("chao1"), 6).as("chao1"))
  }

  /** The deterministic TWO-reference pair harness shared by q211/q212:
    * each doc as candidate against the next two doc ids in its source
    * (lead-1/lead-2 windows — the q198 harness widened), rows lacking
    * two references dropped.
    */
  private def multiRefPairs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("cand_id"))
    t(s, dir, "documents")
      .select(col("doc_id").as("cand_id"), col("text").as("cand_text"), col("source"))
      .withColumn("__r1", lead(col("cand_text"), 1).over(w))
      .withColumn("__r2", lead(col("cand_text"), 2).over(w))
      .filter(col("__r2").isNotNull)
      .select(col("cand_id"), col("cand_text"),
        array(col("__r1"), col("__r2")).as("refs"))
  }

  /** Multi-reference sentence BLEU-4
    * ([[graft.operators.TextEval.bleuMulti]] on
    * [[graft.expressions.NgramOverlapStatsMulti]]): clipping against
    * the per-gram MAX count over both references (Papineni §2.1 — the
    * form real eval sets need), brevity penalty on the closest-length
    * reference with ties to the shorter. The oracle replays the
    * max-merged gram tables, the effective-length CASE, and the q198
    * smoothing/BP/geomean in SQL.
    */
  private def q211BleuMulti(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextEval
    TextEval.bleuMulti(multiRefPairs(s, dir), "cand_text", "refs", maxN = 4)
      .select(col("cand_id"), col("c_len"), col("r_len"),
        col("m1"), col("m2"), col("m3"), col("m4"), col("bp"), col("bleu"))
      .orderBy(col("cand_id"))
  }

  /** Multi-reference ROUGE-1/2
    * ([[graft.operators.TextEval.rougeNMulti]]): per (pair, n) the MAX
    * per-reference F1 (Lin '04 — ROUGE picks the best whole reference,
    * unlike BLEU's per-gram merge), ties to the lowest reference
    * index; entirely map-side (per-ref kernels inside a row-local
    * transform, argmax via array_max over (f1, −idx) structs). The
    * oracle replays both per-reference score sets and the argmax as a
    * window.
    */
  private def q212RougeMulti(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextEval
    TextEval.rougeNMulti(multiRefPairs(s, dir), "cand_text", "refs", ns = Seq(1, 2))
      .select(col("cand_id"), col("n"), col("ref_idx"), col("overlap"),
        col("cand_total"), col("ref_total"),
        col("precision"), col("recall"), col("f1"))
      .orderBy(col("cand_id"), col("n"))
  }

  /** Paired bootstrap significance of a metric delta
    * ([[graft.operators.Stats.pairedBootstrapDelta]], Koehn EMNLP '04):
    * is system A's ROUGE-1 really better than system B's on the same
    * pair set? System A scores the full candidate, system B a
    * controlled degradation (candidate with its last token dropped),
    * both against the same reference; scores enter as exact integer
    * micros, 200 deterministic Poisson(1) replicates reweight the
    * shared units, and the verdict is the percentile CI on the delta
    * plus the fraction of replicates where A wins. The oracle replays
    * the ROUGE-1 scoring of BOTH systems, the md5 CDF-ladder draws,
    * both percentiles and the win fraction.
    */
  private def q213PairedBootstrap(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Stats, TextEval}
    import graft.functions.Tokenize
    val pairs = TextEval.adjacentPairs(t(s, dir, "documents"), "doc_id", "text", "source")
    val ct = Tokenize.tokensSpaceSplit(col("cand_text"), Tokenize.Whitespace)
    // both systems score the SAME pair row, so the two ROUGE kernels
    // chain as projections — one corpus scan, no score-table self-join
    // (which would shuffle the corpus twice at scale)
    val withB = pairs.withColumn("cand_b",
      array_join(slice(ct, lit(1), greatest(size(ct) - 1, lit(0))), " "))
    val scoredA = TextEval.rougeN(withB, "cand_text", "ref_text", ns = Seq(1))
      .select(col("cand_id"), col("cand_b"), col("ref_text"),
        round(col("f1") * 1e6).cast("long").as("a_micro"))
    val scored = TextEval.rougeN(scoredA, "cand_b", "ref_text", ns = Seq(1))
      .select(col("cand_id"), col("a_micro"),
        round(col("f1") * 1e6).cast("long").as("b_micro"))
    Stats.pairedBootstrapDelta(scored, "cand_id", "a_micro", "b_micro",
        nReplicates = 200)
      .select(col("n"), round(col("mean_a") / 1e6, 6).as("mean_a"),
        round(col("mean_b") / 1e6, 6).as("mean_b"),
        round(col("delta") / 1e6, 6).as("delta"),
        col("n_replicates"),
        round(col("ci_lo") / 1e6, 6).as("ci_lo"),
        round(col("ci_hi") / 1e6, 6).as("ci_hi"),
        round(col("frac_a_better"), 6).as("frac_a_better"))
  }

  /** Measurement-driven adaptive join ([[graft.operators.SkewJoins
    * .adaptiveJoin]]): the planner measures (right-side bytes via
    * Catalyst stats, left row count, sampled hottest-key estimate) and
    * picks broadcast / plain / hot-key-salted itself — here on a
    * deliberately skewed key (every third lineitem rekeyed to one hot
    * key, ~⅓ of all rows, far above the 2× average-partition
    * threshold, so the salted path fires at every SF). Strategy choice
    * must never change WHICH rows meet: the oracle is the plain SQL
    * join of the same rekeyed tables (the q47 salt-invariance
    * precedent).
    */
  private def q214AdaptiveJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.SkewJoins
    val li = t(s, dir, "lineitem")
      .select(when(col("l_orderkey") % 3 === 0, lit(1L))
          .otherwise(col("l_orderkey")).as("k"),
        col("l_extendedprice"), col("l_discount"))
    val ord = t(s, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderpriority"))
    // broadcastBytes=0 pins the exercise to the shuffle-side planner:
    // at smoke SF the whole orders table fits any realistic budget and
    // the query would silently test the (already q03-covered)
    // broadcast path instead of the skew machinery
    SkewJoins.adaptiveJoin(li, ord, Seq("k"), broadcastBytes = 0L,
        sampleFraction = 0.2)
      .groupBy(col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))
  }

  /** GIF dHash ([[graft.operators.Multimodal.imageDHash]] over
    * [[graft.operators.Multimodal.synthesizeGifImages]]): real GIF89a
    * payloads decoded through the JDK's ImageIO (first frame for
    * animated — spec-pinned). GIF's 256-color ceiling means the pixels
    * are a 16-color closed-form palette pattern instead of q163's
    * full-color noise — drawn into an exact indexed color model, so
    * the encode is verbatim and the oracle reconstructs every luma,
    * cell mean and difference bit from the palette formula (the q202
    * lossless-codec contract, third format).
    */
  private def q215GifDhash(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.imageDHash(Multimodal.synthesizeGifImages(s, 300))
      .orderBy(col("media_id"))
  }

  /** Near-dup mining through the Unicode tokenizer seam
    * ([[graft.operators.Dedup.jaccardPairsClassed]] with
    * [[graft.functions.Tokenize.Unicode]]): q23's classed Jaccard
    * miner with UAX#29 segmentation in place of whitespace split — on
    * CJK/Thai text whitespace "tokens" are whole clauses and near-dup
    * Jaccard silently collapses to exact-match (spec-pinned: a Chinese
    * near-dup pair scores 0 under whitespace, qualifies under
    * Unicode). Both modes agree bit-for-bit on the space-separated
    * ASCII oracle corpus, so the q23 brute-force oracle applies
    * UNCHANGED — the green row pins the seam as a drop-in.
    */
  private def q216UnicodeDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    import graft.functions.Tokenize
    Dedup.jaccardPairsClassed(t(s, dir, "documents"), "doc_id", "text", "lang",
        0.95, ngram = 1, mode = Tokenize.Unicode)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Sentence-aware chunking verdicts
    * ([[graft.operators.Chunking.sentenceChunks]] /
    * [[graft.expressions.SentenceChunks]]): UAX#29 sentences packed
    * greedily to ≤ 64 whitespace tokens without ever splitting a
    * sentence. Segmentation itself is not SQL-replayable, so the
    * oracle pins the invariants that ARE (the q209 md5-verdict
    * convention): chunks concatenate back to the document
    * byte-for-byte (md5 identity), chunk token counts sum to the
    * document's whitespace token count, and every chunk is within
    * budget or a single oversized sentence. Sentence boundaries are
    * spec-pinned on hand-segmented fixtures (incl. CJK 。).
    */
  private def q217SentenceChunks(s: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(s)
    t(s, dir, "documents")
      .filter(col("text").isNotNull && col("text") =!= "")
      .withColumn("__c", call_function("sentence_chunks", col("text"), lit(64)))
      .select(col("doc_id"),
        md5(concat_ws("", transform(col("__c"), c => c.getField("chunk"))))
          .as("chunks_md5"),
        aggregate(col("__c"), lit(0L),
          (acc, c) => acc + c.getField("n_tokens")).as("tok_total"),
        forall(col("__c"),
          c => c.getField("n_tokens") <= 64 || c.getField("n_sentences") === 1)
          .as("ok_budget"))
      .orderBy(col("doc_id"))
  }

  /** Multi-reference WER ([[graft.operators.TextEval.werMulti]]): the
    * hypothesis scores its BEST (minimum-WER) reference of the two,
    * ties to the lowest index — the ASR/sclite convention, closing the
    * multi-reference eval family (BLEU q211, ROUGE q212). Map-side:
    * per-ref token-Levenshtein kernels inside a row-local transform,
    * argmin via array_min over (wer, idx) structs. The oracle replays
    * BOTH references' full edit-distance DPs (the q207 recursive
    * anti-diagonal CTE keyed by (cand, ref)) and the argmin window.
    */
  private def q218WerMulti(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextEval
    TextEval.werMulti(multiRefPairs(s, dir), "cand_text", "refs")
      .select(col("cand_id"), col("h_len"), col("ref_idx"), col("r_len"),
        col("edits"), col("wer"))
      .orderBy(col("cand_id"))
  }

  /** The blocklist patterns shared by q219's query and oracle: single
    * words, multi-word phrases (matches cross word boundaries), a
    * self-overlapping phrase ("batch batch" occurs TWICE in "batch
    * batch batch"), and a nested pair ("sort" inside "window sort" —
    * both counted at the same text position via the dictionary-suffix
    * emit chain).
    */
  private val blocklistPatterns =
    Seq("vector", "sort", "window sort", "batch batch", "customer", "hash join")

  /** Blocklist screening ([[graft.operators.Blocklist.annotate]]): one
    * Aho–Corasick pass per document counting EVERY occurrence of every
    * banned term — O(len + matches) independent of blocklist size,
    * map-side, zero shuffle beyond the output sort. The oracle
    * brute-forces the same all-occurrence counts per pattern with a
    * position-range substring scan (overlaps included), so the
    * automaton's goto/fail/emit construction is value-pinned end to
    * end.
    */
  private def q219Blocklist(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Blocklist
    val named = blocklistPatterns.map(p => "hits_" + p.replace(' ', '_'))
    val out = Blocklist.annotate(
      t(s, dir, "documents").select(col("doc_id"), col("text")),
      "text", blocklistPatterns)
    named.zipWithIndex.foldLeft(out) { case (df, (name, i)) =>
        df.withColumn(name, element_at(col("hits"), i + 1))
      }
      .select(col("doc_id") +: col("hits_total") +: col("patterns_hit") +:
        col("blocked") +: named.map(col): _*)
      .orderBy(col("doc_id"))
  }

  /** Margin-based bitext mining ([[graft.operators.Bitext.marginMine]],
    * Artetxe & Schwenk '19 ratio margin): a bounded mining batch (even
    * vec_ids < 200, the incremental-alignment form) scored against the
    * odd-id side — forward top-4 by cosine, backward top-4 for the
    * candidates, margin = cos / mean of the two neighbourhood
    * averages, mutual-best both ways, threshold 1.0. Candidate
    * generation is the per-partition-heap exact top-k (query sets
    * bounded: 100 fwd, ≤400 bwd — the q27 collect contract; LSH/IVF
    * generators are the full-corpus 100 TB path, drop-in by column
    * contract). The oracle replays the entire construction — top-k
    * windows with the same (cos desc, id asc) tie-break, averages,
    * symmetric margins, two best-of windows, the mutual join.
    */
  private def q220BitextMargin(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Bitext, Similarity}
    val emb = t(s, dir, "embeddings")
    val batch = emb.filter(col("vec_id") % 2 === 0 && col("vec_id") < 200)
    val tgt = emb.filter(col("vec_id") % 2 === 1)
    val fwd = Similarity.bruteForceTopKAtScale(batch, tgt, "vec_id", "embedding", 4)
    val bwdQueries = emb.join(
      fwd.select(col("neighbour_id").as("vec_id")).distinct(), "vec_id")
    val bwd = Similarity.bruteForceTopKAtScale(bwdQueries, batch, "vec_id", "embedding", 4)
    Bitext.marginMine(fwd, bwd, 1.0)
      .select(col("src_id"), col("tgt_id"),
        round(col("cosine_sim"), 6).as("cosine_sim"),
        round(col("margin"), 6).as("margin"))
      .orderBy(col("src_id"), col("tgt_id"))
  }

  /** Balanced shard assignment ([[graft.operators.Packing.lptShards]],
    * Graham's LPT): per source, docs sorted (tokens DESC, id ASC) go
    * to the least-loaded of 4 shards — the shard writer that equalizes
    * per-file token counts. Groups are the parallelism unit (hash
    * shuffle + within-partition sort + one streaming pass with 4
    * counters — LPT is sequential by definition, so the corpus-global
    * form is deliberately not offered). The oracle replays the exact
    * placement sequence as a recursive CTE stepping the 4 shard loads
    * per source in rank order.
    */
  private def q221LptShards(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Packing
    Packing.lptShards(t(s, dir, "documents"), "source", "doc_id", "text", 4)
      .select(col("group"), col("id"), col("n_tokens"),
        col("shard").cast("long").as("shard"))
      .orderBy(col("id"))
  }

  /** Filter-model calibration ([[graft.operators.Stats.calibration]]):
    * the q30 language-ID heuristic's confidence (top-profile hits over
    * all profile hits; 0 when no profile fires) against its actual
    * accuracy vs the `lang` column, in 10 equal-width bins, plus the
    * expected calibration error — the gate statistic that decides
    * whether a quality/language filter's scores can be thresholded at
    * face value. One corpus aggregate; ECE joins back as a broadcast
    * scalar. The oracle replays q30's hit CTE, the confidence/argmax
    * arithmetic, the binning, and the ECE sum.
    */
  private def q222CalibrationEce(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    import graft.operators.Stats
    val docs = t(s, dir, "documents")
    val hitCols = Seq("de", "en", "es", "fr", "zh").map(l => col(s"${l}_hits"))
    val total = hitCols.reduce(_ + _)
    val scored = TextFunctions.langScoreTable(docs, "doc_id", "text")
      .join(docs.select(col("doc_id").as("id"), col("lang")), "id")
      .select(
        when(total === 0, lit(0.0))
          .otherwise(greatest(hitCols: _*).cast("double") / total).as("conf"),
        (col("pred_lang") === col("lang")).as("correct"))
    Stats.calibration(scored, "conf", "correct", nBins = 10)
      .select(col("bin"), col("n"), round(col("avg_conf"), 6).as("avg_conf"),
        round(col("accuracy"), 6).as("accuracy"), round(col("gap"), 6).as("gap"),
        round(col("ece"), 6).as("ece"))
      .orderBy(col("bin"))
  }

  /** Batch form of [[graft.streaming.EventStreams.statefulUserAgg]] —
    * the mapGroupsWithState escape hatch run in batch mode (state
    * starts empty, each group folds once), so the custom state-fold
    * arithmetic and encoders are ORACLE-pinned against the plain
    * GROUP BY restatement; the cross-micro-batch state RESUME behavior
    * stays pinned by EventStreamsSpec's fold tests.
    */
  private def q153StatefulAgg(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.EventStreams
    val ev = Tables.withEventTime(t(s, dir, "events"))
    EventStreams.statefulUserAgg(ev)
      .select(col("userId").as("user_id"), col("nEvents").as("n_events"),
        round(col("maxValue"), 6).as("max_value"))
      .orderBy(col("user_id"))
  }

  /** Schema-drift ingest gate ([[graft.operators.GroupOps.profileDiff]]):
    * the first-half events profile diffed against a second half whose
    * upstream "changed their export" — `props` dropped, a derived
    * `value2` added — classifying added/removed columns and per-column
    * null-rate / distinct movement. Both profiles and the
    * classification are exact arithmetic, so the oracle restates the
    * per-column UNION ALL profiles and the full-outer classification
    * verbatim.
    */
  private def q154ProfileDiff(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.GroupOps
    val ev = Tables.withEventTime(t(s, dir, "events"))
    val cut = lit("2024-01-15").cast("timestamp")
    val oldS = ev.filter(col("event_time") < cut)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"))
    val newS = ev.filter(col("event_time") >= cut)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .withColumn("value2", round(col("value") * 2, 2))
    GroupOps.profileDiff(oldS, newS)
      .orderBy(col("column_name"))
  }

  /** Seasonal-baseline anomaly rows
    * ([[graft.operators.Drift.seasonalAnomalies]]): first-half events
    * define a per-(event_type, hour-of-day) normal band, second-half
    * rows outside 3 sample deviations are flagged — the per-row alert
    * complement to q125's distribution gate, seasonally conditioned so
    * 3 a.m. is judged against 3 a.m. history. Mean/stddev_samp/z are
    * exact arithmetic DuckDB restates (q82's stddev parity precedent).
    */
  private def q155SeasonalAnomalies(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Drift
    val ev = Tables.withEventTime(t(s, dir, "events"))
      .withColumn("hour_of_day", hour(col("event_time")).cast("long"))
    val cut = lit("2024-01-15").cast("timestamp")
    Drift.seasonalAnomalies(
        ev.filter(col("event_time") < cut),
        ev.filter(col("event_time") >= cut),
        idCols = Seq("event_id"), groupCols = Seq("event_type"),
        seasonCol = "hour_of_day", valueCol = "value", zThreshold = 3.0)
      .select(col("event_id"), col("event_type"), col("hour_of_day"),
        col("value"), round(col("z"), 6).as("z"))
      .orderBy(col("event_id"))
  }

  /** Batch form of [[graft.streaming.EventStreams.windowedHeavyHitters]]
    * (same expression graph; `withWatermark` is a no-op in batch) —
    * the q33–q35 stream==batch pattern applied to the Misra–Gries
    * windowed aggregate so its TypedImperativeAggregate partial-merge
    * arithmetic is ORACLE-pinned, not just spec-pinned. capacity 8 ≥ 5
    * distinct event types puts MG in its exact regime (no decrement
    * ever fires), so the exploded candidate list must equal the exact
    * per-window counts in MG's (est desc, item asc) order — any
    * merge-path corruption shows up as a wrong count. The sub-capacity
    * sketch regime keeps its guarantee spec (MisraGriesSpec) and q83's
    * re-counted oracle.
    */
  private def q148WindowedHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.EventStreams
    val ev = Tables.withEventTime(t(s, dir, "events"))
    EventStreams.windowedHeavyHitters(ev, "event_type", "1 day", capacity = 8)
      .select(col("window_start").cast("string").as("window_start"),
        posexplode(col("heavy")))
      .select(col("window_start"), col("pos").cast("long").as("rank"),
        col("col.item").as("item"), col("col.est").as("n_events"))
      .orderBy(col("window_start"), col("rank"))
  }

  /** Batch form of [[graft.streaming.EventStreams.windowedDistinct]] —
    * the exact roaring-bitmap distinct per tumbling day window,
    * oracle-pinned against the plain COUNT(DISTINCT): the bitmap
    * build/merge wire format must reproduce the exact count per
    * window (the streaming state store folds the same partial buffers).
    */
  private def q149WindowedDistinct(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.EventStreams
    val ev = Tables.withEventTime(t(s, dir, "events"))
    EventStreams.windowedDistinct(ev, "user_id", "1 day")
      .select(col("window_start").cast("string").as("window_start"),
        col("n_distinct"))
      .orderBy(col("window_start"))
  }

  /** Batch form of [[graft.streaming.EventStreams.windowedQuantiles]] —
    * per-day DDSketch p50/p95/p99, oracle-pinned with the q120 BANDED
    * pattern: DuckDB restates the exact rank-order statistics per
    * window (the sketch's own rank convention) and the within_alpha
    * verdicts assert the α = 1% bin-midpoint guarantee — a theorem
    * unless the windowed sketch build/merge is broken.
    */
  private def q150WindowedQuantiles(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.EventStreams
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.withEventTime(t(s, dir, "events"))
    val wq = EventStreams.windowedQuantiles(ev, "value", "1 day")
      .select(col("window_start"), col("p50"), col("p95"), col("p99"))
    val vals = ev.filter(col("value").isNotNull && !isnan(col("value")))
      .select(window(col("event_time"), "1 day").getField("start").as("window_start"),
        col("value"))
    val ranked = vals
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("window_start")).orderBy(col("value"))))
      .join(broadcast(vals.groupBy(col("window_start"))
        .agg(count(lit(1)).as("n"))), Seq("window_start"))
    def rankOf(q: Double): Column = floor(lit(q) * (col("n") - 1) + 0.5) + 1
    val exact = ranked
      .filter(col("rn") === rankOf(0.5) || col("rn") === rankOf(0.95) ||
        col("rn") === rankOf(0.99))
      .groupBy(col("window_start"))
      .agg(
        max(when(col("rn") === rankOf(0.5), col("value"))).as("__e50"),
        max(when(col("rn") === rankOf(0.95), col("value"))).as("__e95"),
        max(when(col("rn") === rankOf(0.99), col("value"))).as("__e99"))
    def band(est: String, ex: String): Column =
      abs(col(est) - col(ex)) <= abs(col(ex)) * lit(0.01) + lit(1e-9)
    wq.join(exact, Seq("window_start"))
      .select(col("window_start").cast("string").as("window_start"),
        round(col("__e50"), 6).as("exact_p50"),
        round(col("__e95"), 6).as("exact_p95"),
        round(col("__e99"), 6).as("exact_p99"),
        band("p50", "__e50").as("p50_within_alpha"),
        band("p95", "__e95").as("p95_within_alpha"),
        band("p99", "__e99").as("p99_within_alpha"))
      .orderBy(col("window_start"))
  }

  /** Threshold-free classifier audit ([[graft.operators.Stats.binaryEval]]):
    * tie-aware ROC AUC (Mann–Whitney rank-sum, ½ credit per tied pair)
    * and step-wise average precision of document length as a predictor
    * of English-ness — the ranking-quality companion to q222's
    * calibration gate. n_chars is heavily tied (many docs share a
    * length), so the tie corrections in BOTH estimators are load-
    * bearing, and the cumulative counts come from the two-phase
    * prefix-sum scan, never a single-partition window.
    */
  private def q223BinaryEval(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Stats
    val docs = t(s, dir, "documents")
      .select(col("n_chars").cast("double").as("score"),
        (col("lang") === "en").as("pos"))
    Stats.binaryEval(docs, "score", "pos")
  }

  /** Per-slice AUC bias audit ([[graft.operators.Stats.binaryEvalBy]]):
    * the q223 classifier re-scored within every `source` slice — the
    * robustness report a filter model ships with (a corpus-level AUC
    * can hide a far-worse slice). Slices whose label is one-sided
    * report NULL ROC AUC (undefined), not a fake 0 — on both engines.
    */
  private def q224AucBySource(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Stats
    val docs = t(s, dir, "documents")
      .select(col("source"), col("n_chars").cast("double").as("score"),
        (col("lang") === "en").as("pos"))
    Stats.binaryEvalBy(docs, Seq("source"), "score", "pos")
      .orderBy(col("source"))
  }

  /** Monotone-trend detector ([[graft.operators.Stats.spearman]]):
    * tie-aware Spearman ρ between event value and event time within
    * each event_type — the distribution-free drift test (is this
    * metric trending?) that Pearson's linear ρ (q82) gets wrong on
    * heavy tails. Ranks are fractional (average) ranks from the
    * distinct-value contingency; time enters as the canonical epoch-ns
    * long ([[Tables.withEventTime]]) so both engines rank the same
    * integers regardless of the parquet timestamp encoding.
    */
  private def q225Spearman(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Stats
    val ev = Tables.withEventTime(t(s, dir, "events"))
      .select(col("event_type"), col("value"), col("ts"))
    Stats.spearman(ev, Seq("event_type"), "value", "ts")
      .orderBy(col("event_type"))
  }

  /** Preference aggregation ([[graft.operators.Stats.bradleyTerry]]):
    * consecutive same-user events become pairwise outcomes (the
    * higher-valued event's type beats the other; equal values and
    * same-type pairs are skipped), then 5 Hunter-'04 MM iterations
    * score the event types. The corpus-sized work (the lead window +
    * pair aggregation) is distributed; the MM runs over the bounded
    * |items|² matrix. The oracle replays the 5 iterations as unrolled
    * CTEs ([[btIterationCtes]]).
    */
  private def q226BradleyTerry(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Stats
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prefs = Tables.withEventTime(t(s, dir, "events"))
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .withColumn("next_value", lead(col("value"), 1).over(w))
      .filter(col("next_type").isNotNull
        && col("value") =!= col("next_value")
        && col("event_type") =!= col("next_type"))
      .select(
        when(col("value") > col("next_value"), col("event_type"))
          .otherwise(col("next_type")).as("winner"),
        when(col("value") > col("next_value"), col("next_type"))
          .otherwise(col("event_type")).as("loser"))
    Stats.bradleyTerry(prefs, "winner", "loser", iterations = 5)
      .orderBy(col("rank"))
  }

  /** Isotonic (PAV) recalibration
    * ([[graft.operators.Stats.isotonicCalibration]]) of the exact q222
    * reliability diagram: the best non-decreasing accuracy-over-
    * confidence fit via the minimax closed form — what a production
    * gate applies to the filter model's raw confidences before
    * thresholding. Same binning as q222 bit-for-bit; the PAV algebra
    * is bounded-bin arithmetic both engines restate exactly.
    */
  private def q227IsotonicFit(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    import graft.operators.Stats
    val docs = t(s, dir, "documents")
    val hitCols = Seq("de", "en", "es", "fr", "zh").map(l => col(s"${l}_hits"))
    val total = hitCols.reduce(_ + _)
    val scored = TextFunctions.langScoreTable(docs, "doc_id", "text")
      .join(docs.select(col("doc_id").as("id"), col("lang")), "id")
      .select(
        when(total === 0, lit(0.0))
          .otherwise(greatest(hitCols: _*).cast("double") / total).as("conf"),
        (col("pred_lang") === col("lang")).as("correct"))
    Stats.isotonicCalibration(scored, "conf", "correct", nBins = 10)
      .select(col("bin"), col("n"), round(col("avg_conf"), 6).as("avg_conf"),
        round(col("accuracy"), 6).as("accuracy"),
        round(col("iso_fit"), 6).as("iso_fit"))
      .orderBy(col("bin"))
  }

  /** In-engine quality-filter training
    * ([[graft.operators.FilterModel.logisticGd]]): logistic regression
    * of English-ness on three engine-computed text features (length,
    * stopword fraction, mean token length), 5 full-batch GD steps —
    * the label-a-slice-fit-score loop of a CCNet-style filter run
    * without leaving the engine. Each step is one map-side-combined
    * gradient aggregate; the oracle replays the 5 steps as unrolled
    * MATERIALIZED CTEs with the identical left-associated float
    * expression.
    */
  private def q228LogregGd(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.FilterModel
    val docs = t(s, dir, "documents")
    val toks = filter(split(lower(trim(col("text"))), "\\s+"),
      t => length(t) > 0)
    val ntok = size(toks).cast("double")
    val stopHits = size(filter(toks,
      t => t.isin("the", "a", "and", "of", "to", "in")))
    val charSum = aggregate(transform(toks, t => length(t)),
      lit(0), (acc, x) => acc + x)
    val feats = docs.select(
      (col("lang") === "en").as("is_en"),
      (col("n_chars").cast("double") / 1000.0).as("len_k"),
      when(ntok === 0, 0.0).otherwise(stopHits.cast("double") / ntok)
        .as("stop_frac"),
      when(ntok === 0, 0.0).otherwise(charSum.cast("double") / ntok / 10.0)
        .as("tok_len"))
    FilterModel.logisticGd(feats, Seq("len_k", "stop_frac", "tok_len"),
        "is_en", iterations = 5, learningRate = 1.0)
      .orderBy(col("term_idx"))
  }

  /** UniMax mixture planning ([[graft.operators.Sampling.unimaxAllocation]]):
    * a 2×-total-tokens training budget spread over sources under a
    * 4-epoch repetition cap — low-resource sources rise toward the cap,
    * large sources split the remainder equally at the waterfill level
    * τ. The corpus-sized work is one token-count aggregate (+ one
    * scalar total for the budget); the closed-form allocation is
    * bounded-source arithmetic both engines restate.
    */
  private def q229UnimaxMix(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    val docs = t(s, dir, "documents")
    val toks = filter(split(lower(trim(col("text"))), "\\s+"),
      t => length(t) > 0)
    // persist the per-source aggregate: the budget scalar and the
    // allocation both read it, so the corpus tokenization runs once
    val counts = docs
      .select(col("source"), size(toks).cast("long").as("ntok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ntok")).cast("double").as("tokens"))
      .persist()
    graft.Caches.track(counts)
    val total = counts.agg(sum(col("tokens"))).collect()(0).getDouble(0)
    Sampling.unimaxAllocation(counts, "source", "n_docs", "tokens",
        budget = 2.0 * total, maxEpochs = 4.0)
      .orderBy(col("source"))
  }

  /** Corpus-balance independence audit
    * ([[graft.operators.Stats.chiSquare]]): Pearson χ² + Cramér's V of
    * lang × source — "is language mix uniform across sources?" — over
    * the full r×c grid including zero-observed cells.
    */
  private def q230ChiSquare(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Stats
    Stats.chiSquare(t(s, dir, "documents"), "source", "lang")
  }

  /** Distribution-shift significance
    * ([[graft.operators.Stats.mannWhitney]]): the tie-corrected
    * Mann–Whitney z for "are English documents longer?" — the
    * hypothesis-test companion to q223's effect size (U = AUC·n₁n₂,
    * same rank machinery, same heavily-tied input).
    */
  private def q231MannWhitney(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Stats
    val docs = t(s, dir, "documents")
      .select(col("n_chars").cast("double").as("score"),
        (col("lang") === "en").as("pos"))
    Stats.mannWhitney(docs, "score", "pos")
  }

  /** Distribution-shape drift ([[graft.operators.Stats.ksTest]]): the
    * two-sample K–S statistic for English-vs-other document lengths —
    * completes the q223/q231 family (effect size → rank significance →
    * CDF-shape distance) off the same distinct-score scan.
    */
  private def q232KsTest(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Stats
    val docs = t(s, dir, "documents")
      .select(col("n_chars").cast("double").as("score"),
        (col("lang") === "en").as("pos"))
    Stats.ksTest(docs, "score", "pos")
  }

  /** The train→evaluate loop COMPOSED in-engine (the q68 composition
    * proof for the round-11 model surface): q228's logistic GD trains
    * a filter, the corpus is scored with the trained (6-dp-rounded —
    * the cross-engine drift cut) weights, and the trained model is
    * audited with q222's reliability bins + ECE and q223's tie-aware
    * AUC pair — every stage individually oracled, here replayed
    * end-to-end in ONE SQL statement. The weight hand-off is a
    * 4-double driver collect (bounded by d). Target: the synthetic
    * corpus carries NO text↔lang signal (q228's honest-but-flat AUC),
    * so this demo trains the length rule `n_chars > 300` the model
    * must RECOVER from its features — 50 steps spread the confidences
    * across ~8 bins, which is what makes the calibration/AUC audit
    * numerically non-degenerate.
    */
  private def q233TrainEval(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{FilterModel, Stats}
    val docs = t(s, dir, "documents")
    val toks = filter(split(lower(trim(col("text"))), "\\s+"),
      t => length(t) > 0)
    val ntok = size(toks).cast("double")
    val stopHits = size(filter(toks,
      t => t.isin("the", "a", "and", "of", "to", "in")))
    val charSum = aggregate(transform(toks, t => length(t)),
      lit(0), (acc, x) => acc + x)
    val feats = docs.filter(col("text").isNotNull)
      .select(
        (col("n_chars") > 300).as("is_long"),
        (col("n_chars").cast("double") / 1000.0).as("len_k"),
        when(ntok === 0, 0.0).otherwise(stopHits.cast("double") / ntok)
          .as("stop_frac"),
        when(ntok === 0, 0.0).otherwise(charSum.cast("double") / ntok / 10.0)
          .as("tok_len"))
    val xCols = Seq("len_k", "stop_frac", "tok_len")
    val w = FilterModel.logisticGd(feats, xCols, "is_long",
        iterations = 50, learningRate = 3.0)
      .orderBy("term_idx").collect().map(_.getAs[Double]("weight"))
    val z = xCols.zipWithIndex.foldLeft(lit(w(0)): Column) {
      case (acc, (c, i)) => acc + col(c) * lit(w(i + 1)) }
    val scored = feats.select(
      (lit(1.0) / (lit(1.0) + exp(-z))).as("conf"), col("is_long").as("correct"))
    val cal = Stats.calibration(scored, "conf", "correct", nBins = 10)
    val auc = Stats.binaryEval(scored, "conf", "correct")
      .select(col("roc_auc"), col("pr_auc"))
    cal.crossJoin(broadcast(auc))
      .select(col("bin"), col("n"), round(col("avg_conf"), 6).as("avg_conf"),
        round(col("accuracy"), 6).as("accuracy"),
        round(col("ece"), 6).as("ece"),
        col("roc_auc"), col("pr_auc"))
      .orderBy(col("bin"))
  }

  /** Decaying monitoring baseline ([[graft.operators.Rolling.ewma]]):
    * per-event-type EWMA of value over event order (α = 0.1, the
    * pandas `ewm(adjust=False)` recurrence) — computed as the
    * partition-local streaming fold; the oracle replays it as the
    * O(n²) closed-form power sum (fine at oracle scale, exists only
    * for the replay — measured agreement 4e-14 worst-case).
    */
  private def q234Ewma(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Rolling
    val ev = Tables.withEventTime(t(s, dir, "events"))
      .select(col("event_type"), col("ts"), col("event_id"), col("value"))
    Rolling.ewma(ev, "event_type", Seq("ts", "event_id"), "value", alpha = 0.1)
      .select(col("key").as("event_type"), col("event_id"),
        round(col("ewma"), 6).as("ewma"))
      .orderBy(col("event_type"), col("event_id"))
  }

  /** Batch-drift proportion gate
    * ([[graft.operators.Stats.twoProportionZ]]): did the English rate
    * move between the even- and odd-id halves of the corpus? — the
    * A/B z-test that completes the significance family (rank q231,
    * shape q232, proportion q235).
    */
  private def q235TwoProportion(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Stats
    val docs = t(s, dir, "documents")
      .select((col("doc_id") % 2 === 0).as("cohort"),
        (col("lang") === "en").as("is_en"))
    Stats.twoProportionZ(docs, "cohort", "is_en")
  }

  /** Score-distribution drift localization ([[graft.operators.Stats.psi]]):
    * PSI of event value, first half of the stream (expected) vs second
    * (actual), 10 fixed bins over [0, 500) — the interpretable-threshold
    * companion to q232's K–S (PSI says WHERE the mass moved).
    */
  private def q236Psi(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Stats
    val ev = Tables.withEventTime(t(s, dir, "events"))
      .select((col("event_time") < lit("2024-01-15").cast("timestamp"))
        .as("baseline"), col("value"))
    Stats.psi(ev, "baseline", "value", lo = 0.0, hi = 500.0, nBins = 10)
      .orderBy(col("bin"))
  }

  /** Error bar on the q223 effect size
    * ([[graft.operators.Stats.binaryEvalBootstrap]]): 100 deterministic
    * Poisson replicates re-run the weighted rank-sum AUC, percentile
    * CI at 95% — the q184 draw machinery composed with the q223 rank
    * machinery, both already oracle-pinned on their own.
    */
  private def q237AucCi(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Stats
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars").cast("double").as("score"),
        (col("lang") === "en").as("pos"))
    Stats.binaryEvalBootstrap(docs, "doc_id", "score", "pos",
      nReplicates = 100, alpha = 0.05)
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_filter_project" -> (q02FilterProject _),
    "q03_join_revenue" -> (q03JoinRevenue _),
    "q04_left_join_counts" -> (q04LeftJoinCounts _),
    "q05_anti_join" -> (q05AntiJoin _),
    "q06_semi_join" -> (q06SemiJoin _),
    "q07_top_order_per_customer" -> (q07TopOrderPerCustomer _),
    "q08_group_mode" -> (q08GroupMode _),
    "q09_grouped_median" -> (q09GroupedMedian _),
    "q10_distinct" -> (q10Distinct _),
    "q11_union_by_name" -> (q11UnionByName _),
    "q12_explode_tokens" -> (q12ExplodeTokens _),
    "q13_regex_extract" -> (q13RegexExtract _),
    "q14_date_parts" -> (q14DateParts _),
    "q15_conditional" -> (q15Conditional _),
    "q16_pivot" -> (q16Pivot _),
    "q17_null_profile" -> (q17NullProfile _),
    "q18_duplicates" -> (q18Duplicates _),
    "q19_dense_id" -> (q19DenseId _),
    "q20_ffill" -> (q20Ffill _),
    "q21_validation" -> (q21Validation _),
    "q22_dedup_exact" -> (q22DedupExact _),
    "q23_jaccard_pairs" -> (q23JaccardPairs _),
    "q24_minhash_lsh" -> (q24MinhashLsh _),
    "q25_simhash" -> (q25Simhash _),
    "q26_cosine_pairs" -> (q26CosinePairs _),
    "q27_ann_topk" -> (q27AnnTopK _),
    "q28_ann_lsh" -> (q28AnnLsh _),
    "q29_text_stats" -> (q29TextStats _),
    "q30_lang_id" -> (q30LangId _),
    "q31_fingerprint" -> (q31Fingerprint _),
    "q32_json_extract" -> (q32JsonExtract _),
    "q33_tumbling_window" -> (q33TumblingWindow _),
    "q34_sliding_window" -> (q34SlidingWindow _),
    "q35_session_window" -> (q35SessionWindow _),
    "q36_multimodal" -> (q36Multimodal _),
    "q37_rollup" -> (q37Rollup _),
    "q38_cube" -> (q38Cube _),
    "q39_count_distinct" -> (q39CountDistinct _),
    "q40_global_topk" -> (q40GlobalTopK _),
    "q41_asof_join" -> (q41AsofJoin _),
    "q42_range_join" -> (q42RangeJoin _),
    "q43_ivf_assign" -> (q43IvfAssign _),
    "q44_ngram_jaccard" -> (q44NgramJaccard _),
    "q45_hash_split" -> (q45HashSplit _),
    "q46_pii_scrub" -> (q46PiiScrub _),
    "q47_salted_join" -> (q47SaltedJoin _),
    "q48_interval_join" -> (q48IntervalJoin _),
    "q49_dedup_components" -> (q49DedupComponents _),
    "q50_chunk_documents" -> (q50ChunkDocuments _),
    "q51_bloom_join" -> (q51BloomJoin _),
    "q52_approx_distinct" -> (q52ApproxDistinct _),
    "q53_cdc_merge" -> (q53CdcMerge _),
    "q54_zorder" -> (q54Zorder _),
    "q55_normalize_nfc" -> (q55NormalizeNfc _),
    "q56_approx_quantiles" -> (q56ApproxQuantiles _),
    "q57_bm25" -> (q57Bm25 _),
    "q58_quantize_int8" -> (q58QuantizeInt8 _),
    "q59_pack_concat" -> (q59PackConcat _),
    "q60_contamination" -> (q60Contamination _),
    "q61_hotkey_salt" -> (q61HotkeySalt _),
    "q62_source_cap" -> (q62SourceCap _),
    "q63_incremental_agg" -> (q63IncrementalAgg _),
    "q64_repetition" -> (q64Repetition _),
    "q65_span_dedup" -> (q65SpanDedup _),
    "q66_kmeans_step" -> (q66KmeansStep _),
    "q67_quantile_buckets" -> (q67QuantileBuckets _),
    "q68_curation_funnel" -> (q68CurationFunnel _),
    "q69_set_ops" -> (q69SetOps _),
    "q70_weighted_sample" -> (q70WeightedSample _),
    "q71_url_normalize" -> (q71UrlNormalize _),
    "q72_vocab_topk" -> (q72VocabTopk _),
    "q73_tfidf" -> (q73TfIdf _),
    "q74_ngram_decontaminate" -> (q74NgramDecontaminate _),
    "q75_pmi_collocations" -> (q75PmiCollocations _),
    "q76_rolling_window" -> (q76RollingWindow _),
    "q77_scd2" -> (q77Scd2 _),
    "q78_quality_model" -> (q78QualityModel _),
    "q79_token_entropy" -> (q79TokenEntropy _),
    "q80_winsorize" -> (q80Winsorize _),
    "q81_kl_divergence" -> (q81KlDivergence _),
    "q82_corr_stats" -> (q82CorrStats _),
    "q83_heavy_hitters" -> (q83HeavyHitters _),
    "q84_funnel" -> (q84Funnel _),
    "q85_edit_distance" -> (q85EditDistancePairs _),
    "q86_unpivot" -> (q86Unpivot _),
    "q87_rank_family" -> (q87RankFamily _),
    "q88_date_features" -> (q88DateFeatures _),
    "q89_random_projection" -> (q89RandomProjection _),
    "q90_ivf_topk" -> (q90IvfTopK _),
    "q91_table_profile" -> (q91TableProfile _),
    "q92_full_outer" -> (q92FullOuter _),
    "q93_asof_forward" -> (q93AsofForward _),
    "q94_asof_nearest" -> (q94AsofNearest _),
    "q95_cluster_resolve" -> (q95ClusterResolve _),
    "q96_stratified_split" -> (q96StratifiedSplit _),
    "q97_snapshot_diff" -> (q97SnapshotDiff _),
    "q98_gapfill_resample" -> (q98GapfillResample _),
    "q99_merge_intervals" -> (q99MergeIntervals _),
    "q100_transitions" -> (q100Transitions _),
    "q101_moments" -> (q101Moments _),
    "q102_inverted_index" -> (q102InvertedIndex _),
    "q103_filtered_ann" -> (q103FilteredAnn _),
    "q104_temperature_sample" -> (q104TemperatureSample _),
    "q105_robust_outliers" -> (q105RobustOutliers _),
    "q106_topk_per_group" -> (q106TopKPerGroup _),
    "q107_share_of_total" -> (q107ShareOfTotal _),
    "q108_zonemap_scan" -> (q108ZonemapScan _),
    "q109_audio_features" -> (q109AudioFeatures _),
    "q110_video_metadata" -> (q110VideoMetadata _),
    "q111_semantic_dedup" -> (q111SemanticDedup _),
    "q112_lm_crossentropy" -> (q112LmCrossEntropy _),
    "q113_pagerank" -> (q113PageRank _),
    "q114_selective_lsh" -> (q114SelectiveLsh _),
    "q115_incremental_dedup" -> (q115IncrementalDedup _),
    "q116_line_dedup" -> (q116LineDedup _),
    "q117_bitmap_distinct" -> (q117BitmapDistinct _),
    "q118_hll_rollup" -> (q118HllRollup _),
    "q119_frame_sample" -> (q119FrameSample _),
    "q120_quantile_sketch" -> (q120QuantileSketch _),
    "q121_pq_encode" -> (q121PqEncode _),
    "q122_pq_adc" -> (q122PqAdc _),
    "q123_retrieval_metrics" -> (q123RetrievalMetrics _),
    "q124_bpe_tokenize" -> (q124BpeTokenize _),
    "q125_drift_psi" -> (q125DriftPsi _),
    "q126_label_prop" -> (q126LabelProp _),
    "q127_retention" -> (q127Retention _),
    "q128_sketch_drift" -> (q128SketchDrift _),
    "q129_triangles" -> (q129Triangles _),
    "q130_dsir_weights" -> (q130DsirWeights _),
    "q131_kmv_retention" -> (q131KmvRetention _),
    "q132_hard_negatives" -> (q132HardNegatives _),
    "q133_cms_freq" -> (q133CmsFreq _),
    "q134_image_pool" -> (q134ImagePool _),
    "q135_corpus_shuffle" -> (q135CorpusShuffle _),
    "q136_audio_spectrum" -> (q136AudioSpectrum _),
    "q137_join_cardinality" -> (q137JoinCardinality _),
    "q138_group_sample" -> (q138GroupSample _),
    "q139_kcore" -> (q139Kcore _),
    "q140_hilbert" -> (q140Hilbert _),
    "q141_rrf_fusion" -> (q141RrfFusion _),
    "q142_cluster_labels" -> (q142ClusterLabels _),
    "q143_session_paths" -> (q143SessionPaths _),
    "q144_rolling_mau" -> (q144RollingMau _),
    "q145_cohort_matrix" -> (q145CohortMatrix _),
    "q146_conversion_lag" -> (q146ConversionLag _),
    "q147_substring_dedup" -> (q147SubstringDedup _),
    "q148_windowed_heavy_hitters" -> (q148WindowedHeavyHitters _),
    "q149_windowed_distinct" -> (q149WindowedDistinct _),
    "q150_windowed_quantiles" -> (q150WindowedQuantiles _),
    "q151_substring_cut" -> (q151SubstringCut _),
    "q152_ivfpq" -> (q152IvfPq _),
    "q153_stateful_agg" -> (q153StatefulAgg _),
    "q154_profile_diff" -> (q154ProfileDiff _),
    "q155_seasonal_anomalies" -> (q155SeasonalAnomalies _),
    "q156_unattributed" -> (q156UnattributedPurchases _),
    "q157_cdc_chunks" -> (q157CdcChunks _),
    "q158_record_linkage" -> (q158RecordLinkage _),
    "q159_leakage_safe_split" -> (q159LeakageSafeSplit _),
    "q160_key_skew_profile" -> (q160KeySkewProfile _),
    "q161_stupid_backoff" -> (q161StupidBackoff _),
    "q162_mixture_rebalance" -> (q162MixtureRebalance _),
    "q163_image_dhash" -> (q163ImageDhash _),
    "q164_dhash_invariance" -> (q164DhashInvariance _),
    "q165_orc_roundtrip" -> (q165OrcRoundtrip _),
    "q166_bot_rate_gate" -> (q166BotRateGate _),
    "q167_matryoshka_recall" -> (q167MatryoshkaRecall _),
    "q168_time_travel" -> (q168TimeTravel _),
    "q169_k_anonymity" -> (q169KAnonymity _),
    "q170_hashed_features" -> (q170HashedFeatures _),
    "q171_datacard" -> (q171Datacard _),
    "q172_ref_integrity" -> (q172RefIntegrity _),
    "q173_gdpr_erase" -> (q173GdprErase _),
    "q174_containment_pairs" -> (q174ContainmentPairs _),
    "q175_containment_dedup" -> (q175ContainmentDedup _),
    "q176_target_encoding" -> (q176TargetEncoding _),
    "q177_quantile_bins" -> (q177QuantileBins _),
    "q178_mutual_info" -> (q178MutualInfo _),
    "q179_benford_audit" -> (q179BenfordAudit _),
    "q180_ab_test" -> (q180AbTest _),
    "q181_chao1" -> (q181Chao1 _),
    "q182_zipf_slope" -> (q182ZipfSlope _),
    "q183_gini_sources" -> (q183GiniSources _),
    "q184_bootstrap_ci" -> (q184BootstrapCi _),
    "q185_cohens_kappa" -> (q185CohensKappa _),
    "q186_weighted_topk" -> (q186WeightedTopK _),
    "q187_trend_slopes" -> (q187TrendSlopes _),
    "q188_mmr_diversify" -> (q188MmrDiversify _),
    "q189_jsonl_roundtrip" -> (q189JsonlRoundtrip _),
    "q190_dp_counts" -> (q190DpCounts _),
    "q191_delta_join" -> (q191DeltaJoin _),
    "q192_rbo" -> (q192Rbo _),
    "q193_mad_outliers" -> (q193MadOutliers _),
    "q194_rfm_features" -> (q194RfmFeatures _),
    "q195_code_tokens" -> (q195CodeTokens _),
    "q196_semantic_decontam" -> (q196SemanticDecontam _),
    "q197_winnowed_pairs" -> (q197WinnowedPairs _),
    "q198_bleu" -> (q198Bleu _),
    "q199_rouge" -> (q199Rouge _),
    "q200_corpus_bleu" -> (q200CorpusBleu _),
    "q201_self_bleu" -> (q201SelfBleu _),
    "q202_png_dhash" -> (q202PngDhash _),
    "q203_jpeg_dhash_stability" -> (q203JpegDhashStability _),
    "q204_png_pool" -> (q204PngPool _),
    "q205_chrf" -> (q205Chrf _),
    "q206_rouge_l" -> (q206RougeL _),
    "q207_wer" -> (q207Wer _),
    "q208_eval_rollup" -> (q208EvalRollup _),
    "q209_unicode_tokens" -> (q209UnicodeTokens _),
    "q210_unicode_vocab" -> (q210UnicodeVocab _),
    "q211_bleu_multi" -> (q211BleuMulti _),
    "q212_rouge_multi" -> (q212RougeMulti _),
    "q213_paired_bootstrap" -> (q213PairedBootstrap _),
    "q214_adaptive_join" -> (q214AdaptiveJoin _),
    "q215_gif_dhash" -> (q215GifDhash _),
    "q216_unicode_dedup" -> (q216UnicodeDedup _),
    "q217_sentence_chunks" -> (q217SentenceChunks _),
    "q218_wer_multi" -> (q218WerMulti _),
    "q219_blocklist" -> (q219Blocklist _),
    "q220_bitext_margin" -> (q220BitextMargin _),
    "q221_lpt_shards" -> (q221LptShards _),
    "q222_calibration_ece" -> (q222CalibrationEce _),
    "q223_binary_eval" -> (q223BinaryEval _),
    "q224_auc_by_source" -> (q224AucBySource _),
    "q225_spearman" -> (q225Spearman _),
    "q226_bradley_terry" -> (q226BradleyTerry _),
    "q227_isotonic_fit" -> (q227IsotonicFit _),
    "q228_logreg_gd" -> (q228LogregGd _),
    "q229_unimax_mix" -> (q229UnimaxMix _),
    "q230_chi_square" -> (q230ChiSquare _),
    "q231_mann_whitney" -> (q231MannWhitney _),
    "q232_ks_test" -> (q232KsTest _),
    "q233_train_eval" -> (q233TrainEval _),
    "q234_ewma" -> (q234Ewma _),
    "q235_two_proportion" -> (q235TwoProportion _),
    "q236_psi" -> (q236Psi _),
    "q237_auc_ci" -> (q237AucCi _))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_discount < 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_join_revenue" ->
      """SELECT r_name, n_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q04_left_join_counts" ->
      """SELECT c_custkey, c_name,
        | count(o_orderkey) AS n_orders,
        | round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY c_custkey""".stripMargin,
    "q05_anti_join" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q06_semi_join" ->
      """SELECT c_custkey, c_mktsegment
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q07_top_order_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        | FROM orders) t
        |WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,
    "q08_group_mode" ->
      """SELECT o_custkey, o_orderpriority AS mode_priority FROM (
        | SELECT o_custkey, o_orderpriority,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY cnt DESC, o_orderpriority ASC) AS rn
        | FROM (SELECT o_custkey, o_orderpriority, count(*) AS cnt
        |       FROM orders WHERE o_orderpriority IS NOT NULL
        |       GROUP BY o_custkey, o_orderpriority) c) t
        |WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,
    "q09_grouped_median" ->
      """SELECT o_orderpriority, round(median(o_totalprice), 4) AS median_price
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q10_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus
        |FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q11_union_by_name" ->
      """SELECT o_orderkey, o_orderpriority, CAST(NULL AS DOUBLE) AS o_totalprice
        |FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION ALL
        |SELECT o_orderkey, CAST(NULL AS VARCHAR), o_totalprice
        |FROM orders WHERE o_totalprice > 400000.0
        |ORDER BY o_orderkey, o_orderpriority, o_totalprice""".stripMargin,
    "q12_explode_tokens" ->
      """SELECT word, count(*) AS n
        |FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part) t
        |GROUP BY word
        |ORDER BY word""".stripMargin,
    "q13_regex_extract" ->
      """SELECT o_orderkey,
        | CAST(nullif(regexp_extract(o_orderpriority, '(\d+)', 1), '') AS INTEGER) AS priority_num,
        | (o_orderpriority LIKE '%URGENT%') AS is_urgent
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "q14_date_parts" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
        | CAST(month(o_orderdate) AS INTEGER) AS order_month,
        | count(*) AS n_orders,
        | round(sum(o_totalprice), 2) AS month_total
        |FROM orders
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q15_conditional" ->
      """SELECT c_mktsegment,
        | CASE WHEN c_acctbal < 0 THEN 'negative'
        |      WHEN c_acctbal < 5000 THEN 'mid'
        |      ELSE 'high' END AS balance_bucket,
        | count(*) AS n_customers
        |FROM customer
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q16_pivot" ->
      """SELECT l_linestatus,
        | round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS "A",
        | round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS "N",
        | round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS "R"
        |FROM lineitem
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,
    "q17_null_profile" ->
      """SELECT column_name, round(null_frac, 6) AS null_frac FROM (
        | SELECT 'event_id' AS column_name, avg(CASE WHEN event_id IS NULL THEN 1.0 ELSE 0.0 END) AS null_frac FROM events
        | UNION ALL SELECT 'ts', avg(CASE WHEN ts IS NULL THEN 1.0 ELSE 0.0 END) FROM events
        | UNION ALL SELECT 'user_id', avg(CASE WHEN user_id IS NULL THEN 1.0 ELSE 0.0 END) FROM events
        | UNION ALL SELECT 'event_type', avg(CASE WHEN event_type IS NULL THEN 1.0 ELSE 0.0 END) FROM events
        | UNION ALL SELECT 'value', avg(CASE WHEN value IS NULL THEN 1.0 ELSE 0.0 END) FROM events
        | UNION ALL SELECT 'props', avg(CASE WHEN props IS NULL THEN 1.0 ELSE 0.0 END) FROM events) t
        |ORDER BY column_name""".stripMargin,
    "q18_duplicates" ->
      """SELECT l_orderkey, l_partkey, count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_orderkey, l_partkey
        |HAVING count(*) > 1
        |ORDER BY l_orderkey, l_partkey""".stripMargin,
    "q19_dense_id" ->
      """SELECT o_orderkey,
        | row_number() OVER (ORDER BY o_orderkey) AS order_sk
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "q20_ffill" ->
      """SELECT event_id, user_id,
        | last_value(v IGNORE NULLS) OVER (
        |   PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
        |FROM (SELECT event_id, user_id, ts,
        |        CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        |      FROM events) t
        |ORDER BY event_id""".stripMargin,
    "q21_validation" ->
      """SELECT check_name, CAST(n_violations AS BIGINT) AS n_violations FROM (
        | SELECT 'positive_price' AS check_name,
        |   sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS n_violations FROM orders
        | UNION ALL SELECT 'valid_status',
        |   sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END) FROM orders
        | UNION ALL SELECT 'priority_format',
        |   sum(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-') THEN 0 ELSE 1 END) FROM orders
        | UNION ALL SELECT 'date_range',
        |   sum(CASE WHEN o_orderdate BETWEEN TIMESTAMP '1992-01-01' AND TIMESTAMP '1998-12-31' THEN 0 ELSE 1 END) FROM orders
        | UNION ALL SELECT 'high_value_urgent',
        |   sum(CASE WHEN NOT(o_totalprice > 450000.0) OR o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) FROM orders) t
        |ORDER BY check_name""".stripMargin,
    "q22_dedup_exact" ->
      """SELECT md5(lower(trim(text))) AS fingerprint,
        | min(doc_id) AS keep_id, count(*) AS group_size
        |FROM documents
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q23_jaccard_pairs" -> jaccardOracle,
    "q24_minhash_lsh" -> jaccardOracle,
    // q25: rebuild the md5-based 64-bit SimHash signature bit by bit
    // (two 32-bit halves — BIGINT-safe) and brute-force ALL pairs; the
    // engine's segment blocking has exact recall at maxDistance=3, so
    // the pair sets must match exactly, not approximately
    "q25_simhash" ->
      """WITH th AS (
        | SELECT doc_id,
        |  CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) AS hi,
        |  CAST(('0x' || substring(md5(tok), 9, 8)) AS BIGINT) AS lo
        | FROM (SELECT doc_id, unnest(list_distinct(string_split(lower(trim(text)), ' '))) AS tok
        |       FROM documents) u
        | WHERE tok <> ''),
        |sums AS (
        | SELECT doc_id, j,
        |  sum(CASE WHEN ((CASE WHEN j < 32 THEN (lo >> j) ELSE (hi >> (j - 32)) END) & 1) = 1
        |           THEN 1 ELSE -1 END) AS s
        | FROM th, generate_series(0, 63) g(j)
        | GROUP BY 1, 2),
        |sig AS (
        | SELECT doc_id,
        |  CAST(sum(CASE WHEN s > 0 AND j < 32 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS sig_lo,
        |  CAST(sum(CASE WHEN s > 0 AND j >= 32 THEN (CAST(1 AS BIGINT) << (j - 32)) ELSE 0 END) AS BIGINT) AS sig_hi
        | FROM sums GROUP BY 1)
        |SELECT id_a, id_b, hamming FROM (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.sig_hi, b.sig_hi)) + bit_count(xor(a.sig_lo, b.sig_lo)) AS INTEGER) AS hamming
        | FROM sig a JOIN sig b ON a.doc_id < b.doc_id) p
        |WHERE hamming <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    "q26_cosine_pairs" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        | round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine_sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35
        |  AND NOT isnan(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]))
        |ORDER BY id_a, id_b""".stripMargin,
    "q27_ann_topk" ->
      """SELECT query_id, neighbour_id, round(c, 6) AS cosine_sim FROM (
        | SELECT q.vec_id AS query_id, c.vec_id AS neighbour_id,
        |  list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS c,
        |  row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
        |             c.vec_id ASC) AS rn
        | FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        | WHERE q.vec_id < 20) t
        |WHERE rn <= 5
        |ORDER BY query_id, neighbour_id""".stripMargin,
    // q28's oracle is the EXACT top-k: the seeded 64x4 LSH params make the
    // approximate result deterministically identical on this corpus, so
    // the hash match doubles as a recall gate (see q28AnnLsh doc)
    "q28_ann_lsh" ->
      """SELECT query_id, neighbour_id, round(c, 6) AS cosine_sim FROM (
        | SELECT q.vec_id AS query_id, c.vec_id AS neighbour_id,
        |  list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS c,
        |  row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
        |             c.vec_id ASC) AS rn
        | FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        | WHERE q.vec_id < 20) t
        |WHERE rn <= 5
        |ORDER BY query_id, neighbour_id""".stripMargin,
    "q29_text_stats" ->
      """SELECT doc_id,
        | len(toks) AS n_tokens,
        | round(len(list_distinct(toks)) * 1.0 / len(toks), 6) AS uniq_ratio,
        | round(list_sum(list_transform(toks, t -> len(t))) * 1.0 / len(toks), 6) AS avg_token_len,
        | round(len(list_filter(toks, t -> t IN ('the','a','and','of','to'))) * 1.0 / len(toks), 6) AS stopword_ratio
        |FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks FROM documents) d
        |ORDER BY doc_id""".stripMargin,
    "q30_lang_id" ->
      """SELECT doc_id, en_hits, de_hits,
        | CASE WHEN greatest(de_hits, en_hits, es_hits, fr_hits, zh_hits) = 0 THEN 'und'
        |      WHEN de_hits >= en_hits AND de_hits >= es_hits AND de_hits >= fr_hits AND de_hits >= zh_hits THEN 'de'
        |      WHEN en_hits >= es_hits AND en_hits >= fr_hits AND en_hits >= zh_hits THEN 'en'
        |      WHEN es_hits >= fr_hits AND es_hits >= zh_hits THEN 'es'
        |      WHEN fr_hits >= zh_hits THEN 'fr'
        |      ELSE 'zh' END AS pred_lang
        |FROM (SELECT doc_id,
        |  len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht','ein','eine','mit','von'))) AS de_hits,
        |  len(list_filter(toks, t -> t IN ('the','a','and','is','not','of','to','in','it','that'))) AS en_hits,
        |  len(list_filter(toks, t -> t IN ('el','la','los','las','y','es','no','un','una','de'))) AS es_hits,
        |  len(list_filter(toks, t -> t IN ('le','la','les','et','est','pas','un','une','dans','que'))) AS fr_hits,
        |  len(list_filter(toks, t -> t IN ('的','是','不','了','在','我','有','和','就','人'))) AS zh_hits
        | FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks FROM documents) d) h
        |ORDER BY doc_id""".stripMargin,
    "q31_fingerprint" ->
      """SELECT doc_id,
        | md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q32_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
        | count(*) AS n, round(avg(value), 4) AS avg_value
        |FROM events
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q33_tumbling_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start, event_type,
        | count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q34_sliding_window" ->
      """SELECT CAST(time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS VARCHAR) AS window_start,
        | count(*) AS n_events
        |FROM events, unnest([0, 1, 2, 3]) AS u(k)
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q35_session_window" ->
      """SELECT user_id, min(us) AS session_start_us, count(*) AS n_events
        |FROM (
        | SELECT user_id, epoch_us(ts) AS us,
        |  sum(CASE WHEN prev_ts IS NULL OR ts - prev_ts >= INTERVAL '30 minutes' THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        | FROM (SELECT user_id, event_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |       FROM events) g) s
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_start_us""".stripMargin,
    // q36's media table is synthesized from pure arithmetic on media_id.
    // IMAGE rows are real 24-bit BMPs whose logical pixel-array byte p is
    // (i*31 + p*7) % 251 (UNSIGNED intensity); the engine's real BMP
    // decoder averages lane p%16 = 0, and the float32 feature lane is
    // replicated bit-exactly with a CAST to REAL (the lane mean is not a
    // /2^k fraction, so skipping the cast would flip round(...,4) on
    // boundary values). Audio/video keep the stub decode: body byte j is
    // the SIGNED cast of (i*31 + j*7) % 251 and feature[0] is the exact
    // integer sum / 256.0 (a /2^k fraction — float-exact, no cast).
    "q36_multimodal" ->
      """SELECT media_id, modality, w, h, frames_sampled, round(f0, 4) AS f0 FROM (
        | SELECT r.i AS media_id, 'image' AS modality,
        |  CAST(16 + (r.i % 6) * 8 AS INT) AS w,
        |  CAST(16 + (r.i % 5) * 8 AS INT) AS h,
        |  1 AS frames_sampled,
        |  CAST(CAST(sum((r.i * 31 + p.p * 7) % 251) AS DOUBLE) / count(*) AS REAL) AS f0
        | FROM range(300) r(i) CROSS JOIN range(8064) p(p)
        | WHERE r.i % 3 = 0 AND p.p % 16 = 0
        |   AND p.p < (16 + (r.i % 6) * 8) * (16 + (r.i % 5) * 8) * 3
        | GROUP BY r.i
        |UNION ALL
        | SELECT r.i AS media_id, 'audio' AS modality,
        |  CAST(8000 + (r.i % 4) * 4000 AS INT) AS w,
        |  CAST(1 + (r.i % 2) AS INT) AS h,
        |  CAST(200 + (r.i % 50) * 4 AS INT) AS frames_sampled,
        |  CAST(CAST(sum((r.i * 31 + j.j * 7) % 251 - 125) AS DOUBLE)
        |       / count(*) AS REAL) AS f0
        | FROM range(300) r(i) CROSS JOIN range(792) j(j)
        | WHERE r.i % 3 = 1 AND j.j % 16 = 0
        |   AND j.j < (200 + (r.i % 50) * 4) * (1 + (r.i % 2))
        | GROUP BY r.i
        |UNION ALL
        | SELECT r.i AS media_id, 'video' AS modality,
        |  CAST(64 + (r.i % 8) * 32 AS INT) AS w,
        |  CAST(64 + (r.i % 5) * 32 AS INT) AS h,
        |  CAST((8 + r.i % 4) // 2 AS INT) AS frames_sampled,
        |  sum(CASE WHEN (r.i * 31 + m.j * 112) % 251 > 127
        |           THEN (r.i * 31 + m.j * 112) % 251 - 256
        |           ELSE (r.i * 31 + m.j * 112) % 251 END) / 256.0 AS f0
        | FROM range(300) r(i) CROSS JOIN range(16) m(j)
        | WHERE r.i % 3 = 2
        | GROUP BY r.i) t
        |ORDER BY media_id""".stripMargin,
    "q37_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        | round(sum(c_acctbal), 2) AS total_balance
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q38_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        | round(avg(o_totalprice), 2) AS avg_price
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q39_count_distinct" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_suppliers,
        | count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q40_global_topk" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 20""".stripMargin,
    "q41_asof_join" ->
      """SELECT e.event_id, e.user_id,
        | round(p.value, 4) AS last_purchase_value
        |FROM events e
        |ASOF LEFT JOIN (
        |  SELECT user_id, ts, arg_max(value, event_id) AS value
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY user_id, ts) p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,
    "q42_range_join" ->
      """SELECT CAST(od AS VARCHAR) AS order_date, count(*) AS n_shipped
        |FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS od FROM orders) d
        |JOIN lineitem ON CAST(l_shipdate AS DATE) >= od
        |             AND CAST(l_shipdate AS DATE) < od + INTERVAL 2 DAY
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q43_ivf_assign" ->
      """SELECT cid AS cell, count(*) AS n_vectors FROM (
        | SELECT e.vec_id, c.cid,
        |  row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.ce::DOUBLE[]) DESC,
        |             c.cid ASC) AS rn
        | FROM embeddings e,
        |      (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8) c) t
        |WHERE rn = 1
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q44_ngram_jaccard" -> ngramJaccardOracle,
    // q114: same output contract as q44 — selectiveBanding changes the
    // candidate machinery only, so the identical brute-force oracle is
    // exactly the check that makes the scale banding adoptable
    "q114_selective_lsh" -> ngramJaccardOracle,
    "q115_incremental_dedup" ->
      """WITH toks AS (
        | SELECT doc_id, lang, list_distinct(string_split(lower(trim(text)), ' ')) AS ts
        | FROM documents),
        |ct AS (SELECT doc_id, lang, unnest(ts) AS token FROM toks WHERE doc_id % 5 <> 0),
        |nt AS (SELECT doc_id, lang, unnest(ts) AS token FROM toks WHERE doc_id % 5 = 0),
        |p AS (SELECT c.doc_id AS corpus_id, n.doc_id AS new_id, count(*) AS shared
        |      FROM ct c JOIN nt n ON c.token = n.token AND c.lang = n.lang
        |      GROUP BY 1, 2)
        |SELECT corpus_id, new_id,
        | round(shared * 1.0 / (sa.n + sb.n - shared), 6) AS jaccard
        |FROM p
        |JOIN (SELECT doc_id, len(ts) AS n FROM toks WHERE doc_id % 5 <> 0) sa ON corpus_id = sa.doc_id
        |JOIN (SELECT doc_id, len(ts) AS n FROM toks WHERE doc_id % 5 = 0) sb ON new_id = sb.doc_id
        |WHERE shared * 1.0 / (sa.n + sb.n - shared) >= 0.9
        |ORDER BY corpus_id, new_id""".stripMargin,
    "q116_line_dedup" ->
      ("""WITH seg AS (
        | SELECT doc_id,
        |  regexp_replace(text, '((?:\S+ ){9}\S+) ', '\1' || chr(10), 'g') AS t
        | FROM documents),
        |l0 AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM seg),
        |lines AS (SELECT doc_id, unnest(ls) AS line,
        |          unnest(range(1, len(ls) + 1)) AS pos FROM l0),
        |keyed AS (SELECT doc_id, pos, line, md5(lower(trim(line))) AS k FROM lines),
        |boiler AS (SELECT k FROM (
        |  SELECT k, count(DISTINCT doc_id) AS d FROM keyed GROUP BY 1) f
        |  WHERE d >= 2),
        |reb AS (
        | SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_clean,
        |        count(*) AS lines_kept
        | FROM keyed WHERE k NOT IN (SELECT k FROM boiler)
        | GROUP BY 1)
        |SELECT l0.doc_id, coalesce(reb.text_clean, '') AS text_clean,
        | CAST(coalesce(reb.lines_kept, 0) AS BIGINT) AS lines_kept,
        | CAST(len(l0.ls) AS BIGINT) AS lines_total
        |FROM l0 LEFT JOIN reb ON l0.doc_id = reb.doc_id
        |ORDER BY l0.doc_id""").stripMargin,
    // q45: the split is a pure function of md5(doc_id) — the oracle
    // recomputes bucket and label from scratch (bounds for 0.8/0.1/0.1
    // over 10000 buckets: [0,8000) [8000,9000) [9000,10000))
    "q45_hash_split" ->
      """SELECT split, lang, count(*) AS n_docs FROM (
        | SELECT lang,
        |  CASE WHEN b < 8000 THEN 'train'
        |       WHEN b < 9000 THEN 'val'
        |       ELSE 'test' END AS split
        | FROM (SELECT lang,
        |        CAST(('0x' || substring(md5(coalesce(CAST(doc_id AS VARCHAR), '__graft_null_key__')), 1, 8)) AS BIGINT) % 10000 AS b
        |       FROM documents) t) s
        |GROUP BY split, lang
        |ORDER BY split, lang""".stripMargin,
    // q46: identical synthetic-PII injection and the identical
    // RE2-compatible patterns, replayed in DuckDB (regexp_replace with
    // the 'g' flag = Spark's replace-all); scrub order matters and is
    // mirrored: emails -> ipv4 -> ipv6 -> cards -> date-shield ->
    // phones -> unshield (chr(1) = the \u0001 sentinel; backreference
    // syntax is \1 in DuckDB vs $1 in Java, same semantics — a
    // non-participating group substitutes empty on both engines)
    "q46_pii_scrub" ->
      """SELECT doc_id, md5(
        | regexp_replace(
        |  regexp_replace(
        |   regexp_replace(
        |    -- card redaction AFTER the date shield: adjacent dates form a
        |    -- card-shaped digit run and must already carry sentinels
        |    regexp_replace(
        |     -- second shield pass: the consuming boundary group makes one
        |     -- pass skip every other date in an adjacent run (the engine
        |     -- mirrors this with a double shieldDates)
        |     regexp_replace(
        |      regexp_replace(
        |       regexp_replace(
        |        regexp_replace(injected, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |        '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |       '\b(?:[0-9A-Fa-f]{0,4}:){2,7}[0-9A-Fa-f]{0,4}\b', '<IP>', 'g'),
        |      '(^|[^0-9./-])(?:([0-9]{4}[-/.])([0-9]{2}[-/.])([0-9]{2})|([0-9]{2}[-/.])([0-9]{2}[-/.])([0-9]{4}))([^0-9]|$)',
        |      '\1\2' || chr(1) || '\3' || chr(1) || '\4\5' || chr(1) || '\6' || chr(1) || '\7\8', 'g'),
        |     '(^|[^0-9./-])(?:([0-9]{4}[-/.])([0-9]{2}[-/.])([0-9]{2})|([0-9]{2}[-/.])([0-9]{2}[-/.])([0-9]{4}))([^0-9]|$)',
        |     '\1\2' || chr(1) || '\3' || chr(1) || '\4\5' || chr(1) || '\6' || chr(1) || '\7\8', 'g'),
        |    '\b[0-9](?:[0-9 -]{11,17})[0-9]\b', '<CARD>', 'g'),
        |   '\+?[0-9](?:[()\s.-]{0,2}[0-9]){6,}', '<PHONE>', 'g'),
        |  chr(1), '', 'g')) AS scrubbed_md5,
        | len(string_split_regex(injected, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) - 1 AS n_emails
        |FROM (
        | SELECT doc_id,
        |  text || ' Contact user' || CAST(doc_id AS VARCHAR)
        |       || '@example.com or call +1 (555) 010-'
        |       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |       || ' from 192.168.' || CAST(doc_id % 256 AS VARCHAR) || '.17 today.' AS injected
        | FROM documents) t
        |ORDER BY doc_id""".stripMargin,
    // q47: salting is invisible in the result — the oracle is the PLAIN join
    "q47_salted_join" ->
      """SELECT o_orderpriority,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // q48: stream-stream interval join, replayed as a SQL interval join
    // (ts is µs-aligned TIMESTAMP_NS on the DuckDB side, timestamp_micros
    // on the Spark side — boundaries compare exactly)
    "q48_interval_join" ->
      """SELECT p.event_id AS purchase_id, v.event_id AS view_id,
        | p.user_id, round(p.value, 4) AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id
        | AND v.ts <= p.ts
        | AND v.ts >= p.ts - INTERVAL 30 MINUTE
        |ORDER BY purchase_id, view_id""".stripMargin,
    // q49: the same brute-force pair set at 0.8, closed into connected
    // components with a recursive CTE (min reachable id per node = the
    // canonical keep id the engine's label propagation converges to)
    "q49_dedup_components" ->
      s"""WITH RECURSIVE pairs AS (${jaccardPairsSql("0.8")}),
         |edges AS (
         | SELECT id_a AS src, id_b AS dst FROM pairs
         | UNION SELECT id_b, id_a FROM pairs),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |reach(id, r) AS (
         | SELECT id, id FROM nodes
         | UNION
         | SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst),
         |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
         |SELECT component AS keep_id, count(*) AS cluster_size, max(id) AS max_member
         |FROM comp GROUP BY component ORDER BY keep_id""".stripMargin,
    "q50_chunk_documents" ->
      """WITH d AS (
        | SELECT doc_id, string_split(text, ' ') AS toks
        | FROM documents WHERE doc_id < 2000),
        |st AS (SELECT doc_id, toks, unnest(range(0, len(toks), 16)) AS s FROM d)
        |SELECT doc_id, s // 16 AS chunk_id,
        | md5(array_to_string(toks[(s+1):(s+32)], ' ')) AS chunk_md5,
        | CAST(len(toks[(s+1):(s+32)]) AS BIGINT) AS n_tokens
        |FROM st
        |ORDER BY doc_id, chunk_id""".stripMargin,
    // q51: the oracle is the PLAIN join — bloom false positives must be
    // invisible in the result
    "q51_bloom_join" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q52: the oracle recomputes the exact counts and expects the 5%
    // accuracy claim to hold (approx_ok literally true per group)
    "q52_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_exact,
        | TRUE AS approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q53_cdc_merge" ->
      """SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS last_ts_us,
        | round(value, 4) AS last_value, event_type AS last_type
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin,
    // q54: the oracle's interleave expression is GENERATED from the same
    // loop as the engine's Column expression — one formula, two engines
    "q54_zorder" ->
      s"""SELECT x, y, ${graft.operators.Layout.zValue2Sql("x", "y", 12)} AS z
         |FROM (SELECT l_orderkey % 4096 AS x, l_partkey % 4096 AS y
         |      FROM lineitem WHERE l_orderkey < 3000) t
         |ORDER BY z, x, y""".stripMargin,
    // q55: chr(769/776/778) = the combining marks injected engine-side;
    // nfc_normalize implements the same Unicode NFC algorithm as the
    // JDK Normalizer the engine wraps
    "q55_normalize_nfc" ->
      """SELECT doc_id, md5(nfc_normalize(injected)) AS norm_md5,
        | CAST(length(injected) - length(nfc_normalize(injected)) AS BIGINT) AS n_composed
        |FROM (SELECT doc_id,
        |        text || ' cafe' || chr(769) || ' u' || chr(776) || 'ni A' || chr(778) || ' end' AS injected
        |      FROM documents) t
        |ORDER BY doc_id""".stripMargin,
    // q56: quantile_cont = Spark's interpolated `percentile`; the oracle
    // recomputes the exact values and expects both accuracy claims true
    "q56_approx_quantiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.5), 2) AS p50_exact,
        | round(quantile_cont(l_extendedprice, 0.95), 2) AS p95_exact,
        | TRUE AS p50_ok, TRUE AS p95_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // q57: the full BM25 formula restated independently — Lucene-style
    // idf ln(1+(N-n+0.5)/(n+0.5)), k1=1.2, b=0.75 length norm
    "q57_bm25" ->
      """WITH docs AS (
        |  SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks FROM documents),
        |dl AS (SELECT doc_id, len(toks) AS dl FROM docs),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |tf AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(toks) AS token FROM docs)
        |  WHERE token IN ('vector', 'stream', 'window')
        |  GROUP BY doc_id, token),
        |dfreq AS (SELECT token, count(*) AS nt FROM tf GROUP BY token)
        |SELECT tf.doc_id, count(*) AS n_matched,
        | round(sum(ln(1 + (stats.n_docs - dfreq.nt + 0.5) / (dfreq.nt + 0.5))
        |   * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)))), 6) AS score
        |FROM tf JOIN dfreq USING (token) JOIN dl ON tf.doc_id = dl.doc_id
        |CROSS JOIN stats
        |GROUP BY tf.doc_id
        |ORDER BY tf.doc_id""".stripMargin,
    // q58: per-element recompute via unnest — scale, int8 codes
    // (round half away from zero in both engines), error bound. The
    // final left join keeps rows whose embedding is EMPTY (unnest emits
    // nothing; the kernel reports all-zeros) or NULL (kernel reports
    // nulls) so the row sets can never diverge from the engine
    "q58_quantize_int8" ->
      """WITH v AS (SELECT vec_id, unnest(embedding::DOUBLE[]) AS x FROM embeddings),
        |s AS (SELECT vec_id, max(abs(x)) / 127.0 AS scale FROM v GROUP BY vec_id),
        |q AS (SELECT v.vec_id, s.scale, x,
        |        CASE WHEN s.scale = 0 THEN 0
        |             ELSE CAST(round(x / s.scale) AS INTEGER) END AS qi
        |      FROM v JOIN s USING (vec_id)),
        |agg AS (
        | SELECT vec_id, round(any_value(scale), 6) AS scale,
        |  CAST(sum(qi) AS BIGINT) AS q_sum,
        |  CAST(sum(abs(qi)) AS BIGINT) AS q_l1,
        |  round(max(abs(qi * scale - x)), 6) AS max_err
        | FROM q GROUP BY vec_id)
        |SELECT e.vec_id,
        | CASE WHEN e.embedding IS NULL THEN NULL ELSE coalesce(agg.scale, 0.0) END AS scale,
        | CASE WHEN e.embedding IS NULL THEN NULL ELSE coalesce(agg.q_sum, 0) END AS q_sum,
        | CASE WHEN e.embedding IS NULL THEN NULL ELSE coalesce(agg.q_l1, 0) END AS q_l1,
        | CASE WHEN e.embedding IS NULL THEN NULL ELSE coalesce(agg.max_err, 0.0) END AS max_err
        |FROM embeddings e LEFT JOIN agg USING (vec_id)
        |ORDER BY e.vec_id""".stripMargin,
    // q59: the oracle uses the windowed-SUM form of the same prefix sum
    // (single-partition is fine at oracle scale; the engine's two-phase
    // scan must agree row for row)
    "q59_pack_concat" ->
      """SELECT doc_id, n_tokens, start_off,
        | CAST(start_off // 512 AS BIGINT) AS bin,
        | CAST(CASE WHEN n_tokens = 0 THEN 1
        |      ELSE (start_off + n_tokens - 1) // 512 - start_off // 512 + 1 END AS BIGINT) AS bins_spanned
        |FROM (
        | SELECT doc_id, n_tokens,
        |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
        | FROM (SELECT doc_id, len(string_split(trim(text), ' ')) AS n_tokens FROM documents) t) o
        |ORDER BY doc_id""".stripMargin,
    // q60: brute-force Jaccard pairs × independently recomputed split
    // labels; only straddling pairs survive
    "q60_contamination" ->
      s"""WITH splits AS (
         | SELECT doc_id,
         |  CASE WHEN b < 8000 THEN 'train'
         |       WHEN b < 9000 THEN 'val'
         |       ELSE 'test' END AS split
         | FROM (SELECT doc_id,
         |        CAST(('0x' || substring(md5(coalesce(CAST(doc_id AS VARCHAR), '__graft_null_key__')), 1, 8)) AS BIGINT) % 10000 AS b
         |       FROM documents) t)
         |SELECT p.id_a, p.id_b, sa.split AS split_a, sb.split AS split_b,
         | round(p.jaccard, 6) AS jaccard
         |FROM (${jaccardPairsSql("0.95")}) p
         |JOIN splits sa ON p.id_a = sa.doc_id
         |JOIN splits sb ON p.id_b = sb.doc_id
         |WHERE sa.split <> sb.split
         |ORDER BY p.id_a, p.id_b""".stripMargin,
    // q61: the oracle is the PLAIN join — hot-key salting must be
    // result-invariant (same contract as q47)
    "q61_hotkey_salt" ->
      """SELECT s_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY s_name""".stripMargin,
    // q62: reselect the identical capped rows — row_number over the
    // portable md5 order, same 40-cap
    "q62_source_cap" ->
      """SELECT source, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum FROM (
        | SELECT source, doc_id,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        | FROM documents) t
        |WHERE rn <= 40
        |GROUP BY source ORDER BY source""".stripMargin,
    // q63: cold full-table recompute — the incrementally-merged
    // aggregate must be indistinguishable from it
    "q63_incremental_agg" ->
      """SELECT o_orderpriority, count(*) AS n_rows,
        | round(sum(o_totalprice), 2) AS price_sum,
        | count(o_totalprice) AS price_cnt,
        | round(min(o_totalprice), 2) AS price_min,
        | round(max(o_totalprice), 2) AS price_max,
        | round(sum(o_totalprice) / count(o_totalprice), 4) AS price_avg
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // q64: bigrams rebuilt positionally (1-based list indexing); docs
    // with < 2 tokens produce no bigram and no row, same as the engine
    "q64_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks FROM documents),
        |b AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS gram
        |      FROM t, unnest(range(1, len(toks))) AS u(i)),
        |c AS (SELECT doc_id, gram, count(*) AS cnt FROM b GROUP BY doc_id, gram)
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_grams,
        | round(CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS BIGINT), 6) AS top_frac,
        | round(1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS BIGINT), 6) AS dup_frac
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q65: identical span selection — non-overlapping 8-token slices,
    // global first occurrence by packed (doc, chunk) key, rebuild in
    // chunk order
    "q65_span_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
        |c AS (SELECT doc_id, i AS chunk_id,
        |       array_to_string(toks[(i * 8 + 1):(i * 8 + 8)], ' ') AS chunk
        |      FROM t, unnest(range(0, (len(toks) + 7) // 8)) AS u(i)),
        |f AS (SELECT md5(chunk) AS h, min(doc_id * 1048576 + chunk_id) AS k_first
        |      FROM c GROUP BY md5(chunk)),
        |k AS (SELECT c.doc_id, c.chunk_id, c.chunk,
        |       (c.doc_id * 1048576 + c.chunk_id = f.k_first) AS keep
        |      FROM c JOIN f ON md5(c.chunk) = f.h)
        |SELECT doc_id,
        | CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        | CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
        | md5(coalesce(string_agg(CASE WHEN keep THEN chunk END, ' ' ORDER BY chunk_id), '')) AS text_md5
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q66: same cosine argmax assignment as q43, then positional means
    // per cell — one Lloyd update restated independently
    "q66_kmeans_step" ->
      """WITH a AS (
        | SELECT vec_id, embedding, cid AS cell FROM (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |   row_number() OVER (PARTITION BY e.vec_id
        |     ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.ce::DOUBLE[]) DESC,
        |              c.cid ASC) AS rn
        |  FROM embeddings e,
        |       (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8) c) t
        | WHERE rn = 1),
        |d AS (
        | SELECT cell, i AS pos, avg(CAST(embedding[i] AS DOUBLE)) AS m
        | FROM a, unnest(range(1, len(embedding) + 1)) AS u(i)
        | GROUP BY cell, i),
        |s AS (
        | SELECT cell, round(sqrt(sum(m * m)), 6) AS centroid_norm,
        |        round(sum(m), 6) AS centroid_sum
        | FROM d GROUP BY cell)
        |SELECT a2.cell, count(*) AS n_members, s.centroid_norm, s.centroid_sum
        |FROM a a2 JOIN s ON a2.cell = s.cell
        |GROUP BY a2.cell, s.centroid_norm, s.centroid_sum
        |ORDER BY a2.cell""".stripMargin,
    // q67: the oracle runs the ntile window the engine deliberately
    // avoids — closed-form arithmetic over a two-phase rank must equal it
    "q67_quantile_buckets" ->
      """SELECT bucket, count(*) AS n_rows,
        | round(min(l_extendedprice), 2) AS price_min,
        | round(max(l_extendedprice), 2) AS price_max,
        | round(sum(l_extendedprice), 2) AS price_sum
        |FROM (
        | SELECT l_extendedprice,
        |  CAST(ntile(4) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS BIGINT) AS bucket
        | FROM lineitem) t
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
    // q68: the whole funnel rebuilt independently — langid argmax
    // (q30's ladder), token-stats gates, normalized-md5 min-id dedup,
    // then the q45 split ladder; stage counts unioned in pipeline order
    "q68_curation_funnel" ->
      """WITH toks AS (
        | SELECT doc_id, text, string_split(lower(trim(text)), ' ') AS t FROM documents),
        |lang AS (
        | SELECT doc_id, text,
        |  CASE WHEN greatest(de_hits, en_hits, es_hits, fr_hits, zh_hits) = 0 THEN 'und'
        |       WHEN de_hits >= en_hits AND de_hits >= es_hits AND de_hits >= fr_hits AND de_hits >= zh_hits THEN 'de'
        |       WHEN en_hits >= es_hits AND en_hits >= fr_hits AND en_hits >= zh_hits THEN 'en'
        |       WHEN es_hits >= fr_hits AND es_hits >= zh_hits THEN 'es'
        |       WHEN fr_hits >= zh_hits THEN 'fr'
        |       ELSE 'zh' END AS pred_lang
        | FROM (SELECT doc_id, text,
        |   len(list_filter(t, x -> x IN ('der','die','das','und','ist','nicht','ein','eine','mit','von'))) AS de_hits,
        |   len(list_filter(t, x -> x IN ('the','a','and','is','not','of','to','in','it','that'))) AS en_hits,
        |   len(list_filter(t, x -> x IN ('el','la','los','las','y','es','no','un','una','de'))) AS es_hits,
        |   len(list_filter(t, x -> x IN ('le','la','les','et','est','pas','un','une','dans','que'))) AS fr_hits,
        |   len(list_filter(t, x -> x IN ('的','是','不','了','在','我','有','和','就','人'))) AS zh_hits
        |  FROM toks) h),
        |l AS (SELECT doc_id, text FROM lang WHERE pred_lang = 'en'),
        |q AS (
        | SELECT l.doc_id, l.text FROM l JOIN toks USING (doc_id)
        | WHERE len(t) >= 30 AND len(list_distinct(t)) * 1.0 / len(t) >= 0.35),
        |d AS (
        | SELECT doc_id, text FROM q
        | WHERE doc_id IN (
        |  SELECT min(doc_id) FROM q
        |  GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')))),
        |s AS (
        | SELECT CASE WHEN b < 8000 THEN 'train'
        |             WHEN b < 9000 THEN 'val'
        |             ELSE 'test' END AS split
        | FROM (SELECT CAST(('0x' || substring(md5(coalesce(CAST(doc_id AS VARCHAR), '__graft_null_key__')), 1, 8)) AS BIGINT) % 10000 AS b
        |       FROM d) t)
        |SELECT stage, n_docs FROM (
        | SELECT '1_input' AS stage, count(*) AS n_docs FROM documents
        | UNION ALL SELECT '2_lang_en', count(*) FROM l
        | UNION ALL SELECT '3_quality', count(*) FROM q
        | UNION ALL SELECT '5_' || split, count(*) FROM s GROUP BY split
        | UNION ALL SELECT '4_dedup', count(*) FROM d)
        |ORDER BY stage""".stripMargin,
    // q69: INTERSECT/EXCEPT restated natively
    "q69_set_ops" ->
      """WITH y96 AS (SELECT o_custkey FROM orders
         |  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'),
         |y97 AS (SELECT o_custkey FROM orders
         |  WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01')
         |SELECT set_op, count(*) AS n_customers FROM (
         | SELECT 'both_years' AS set_op, o_custkey FROM (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97) a
         | UNION ALL
         | SELECT 'only_1996', o_custkey FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97) b) t
         |GROUP BY set_op ORDER BY set_op""".stripMargin,
    // q70: membership recomputed row by row — same md5 bucket, same
    // weight normalization, same rounding
    "q70_weighted_sample" ->
      """SELECT lang, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM (
        | SELECT lang, doc_id,
        |  CAST(('0x' || substring(md5(coalesce(CAST(doc_id AS VARCHAR), '__graft_null_key__')), 1, 8)) AS BIGINT) % 10000 AS b,
        |  CAST(n_chars AS DOUBLE) / (SELECT max(n_chars) FROM documents) AS p
        | FROM documents) t
        |WHERE b < round(p * 10000)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // q71: the same normalization chain, step by step, on both raw
    // spellings (DuckDB regexp_replace needs the 'g' flag and \1
    // backreferences where Spark replaces all and uses $1)
    "q71_url_normalize" ->
      """WITH raw AS (
        | SELECT doc_id,
        |  'HTTPS://Example.COM/docs/' || doc_id || '/?utm_source=feed&ref=rss#top' AS a,
        |  'https://example.com/docs/' || doc_id AS b
        | FROM documents),
        |s1 AS (SELECT doc_id,
        |  lower(regexp_extract(a, '^([a-zA-Z]+://[^/?#]*)', 1)) || regexp_extract(a, '^[a-zA-Z]+://[^/?#]*(.*)$', 1) AS a,
        |  lower(regexp_extract(b, '^([a-zA-Z]+://[^/?#]*)', 1)) || regexp_extract(b, '^[a-zA-Z]+://[^/?#]*(.*)$', 1) AS b
        | FROM raw),
        |s2 AS (SELECT doc_id, regexp_replace(a, '#.*$', '', 'g') AS a,
        |                      regexp_replace(b, '#.*$', '', 'g') AS b FROM s1),
        |s3 AS (SELECT doc_id,
        |  regexp_replace(a, '([?&])(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*', '\1', 'g') AS a,
        |  regexp_replace(b, '([?&])(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*', '\1', 'g') AS b FROM s2),
        |s4 AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(a, '&&+', '&', 'g'), '\?&', '?', 'g'), '[?&]+$', '', 'g') AS a,
        |  regexp_replace(regexp_replace(regexp_replace(b, '&&+', '&', 'g'), '\?&', '?', 'g'), '[?&]+$', '', 'g') AS b FROM s3),
        |s5 AS (SELECT doc_id,
        |  regexp_replace(a, '(://[^/?#]+/.+?)/$', '\1', 'g') AS a,
        |  regexp_replace(b, '(://[^/?#]+/.+?)/$', '\1', 'g') AS b FROM s4)
        |SELECT doc_id, md5(a) AS norm_md5, a = b AS canonical_match
        |FROM s5 ORDER BY doc_id""".stripMargin,
    // q72: same tokenizer (lower+trim+split), empty tokens excluded;
    // deterministic top-100 boundary via the (tf DESC, token ASC) tie-break
    "q72_vocab_topk" ->
      """SELECT token, tf, df FROM (
        | SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
        | FROM (SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS token
        |       FROM documents) u
        | WHERE token <> ''
        | GROUP BY token) v
        |ORDER BY tf DESC, token
        |LIMIT 100""".stripMargin,
    // q73: full-corpus N and df (the WHERE trims output only), ln-smoothed
    // idf = ln(N / n_t), identical double evaluation order on both engines
    "q73_tfidf" ->
      """WITH t AS (
        | SELECT doc_id, term, count(*) AS tf
        | FROM (SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS term
        |       FROM documents) u
        | GROUP BY doc_id, term),
        |d AS (SELECT term, count(*) AS nt FROM t GROUP BY term),
        |n AS (SELECT count(*) AS nd FROM documents)
        |SELECT doc_id, term, tf, round(tf * ln(CAST(nd AS DOUBLE) / nt), 6) AS tf_idf
        |FROM t JOIN d USING (term), n
        |WHERE doc_id < 20 AND term <> ''
        |ORDER BY doc_id, term""".stripMargin,
    // q74: split labels replayed exactly as q45's oracle, 8-grams built
    // as strings (list slice + join) — per-doc DISTINCT matches the
    // engine's distinct hashed shingle sets
    "q74_ngram_decontaminate" ->
      """WITH labeled AS (
        | SELECT doc_id, text,
        |  CASE WHEN b < 8000 THEN 'train' WHEN b < 9000 THEN 'val' ELSE 'test' END AS split
        | FROM (SELECT doc_id, text,
        |   CAST(('0x' || substring(md5(coalesce(CAST(doc_id AS VARCHAR), '__graft_null_key__')), 1, 8)) AS BIGINT) % 10000 AS b
        |  FROM documents) t),
        |toks AS (SELECT doc_id, split, string_split(lower(trim(text)), ' ') AS tk FROM labeled),
        |grams AS (
        | SELECT DISTINCT doc_id, split, array_to_string(tk[j:j+7], ' ') AS g
        | FROM (SELECT doc_id, split, tk,
        |        unnest(generate_series(1, len(tk) - 7)) AS j FROM toks) x)
        |SELECT tr.doc_id, count(*) AS n_shared
        |FROM (SELECT doc_id, g FROM grams WHERE split = 'train') tr
        |JOIN (SELECT DISTINCT g FROM grams WHERE split = 'test') te USING (g)
        |GROUP BY tr.doc_id
        |ORDER BY tr.doc_id""".stripMargin,
    // q75: bigrams rebuilt by list indexing; PMI with explicit double
    // casts (DuckDB integer division would truncate); same (pmi desc,
    // words) boundary tie-break
    "q75_pmi_collocations" ->
      """WITH toks AS (
        | SELECT string_split(lower(trim(text)), ' ') AS tk FROM documents),
        |bi AS (
        | SELECT tk[j] AS word_a, tk[j+1] AS word_b
        | FROM (SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS j FROM toks) x
        | WHERE tk[j] <> '' AND tk[j+1] <> ''),
        |bc AS (SELECT word_a, word_b, count(*) AS c_ab FROM bi GROUP BY 1, 2
        |       HAVING count(*) >= 5),
        |uc AS (SELECT token, count(*) AS c
        |       FROM (SELECT unnest(tk) AS token FROM toks) u
        |       WHERE token <> '' GROUP BY token),
        |nu AS (SELECT CAST(sum(c) AS DOUBLE) AS n_uni FROM uc),
        |nb AS (SELECT CAST(sum(c_ab) AS DOUBLE) AS n_bi FROM bc)
        |SELECT word_a, word_b, c_ab,
        | round(ln((CAST(c_ab AS DOUBLE) / n_bi) /
        |          ((CAST(ca.c AS DOUBLE) / n_uni) * (CAST(cb.c AS DOUBLE) / n_uni))), 6) AS pmi
        |FROM bc
        |JOIN uc ca ON bc.word_a = ca.token
        |JOIN uc cb ON bc.word_b = cb.token, nu, nb
        |ORDER BY pmi DESC, word_a, word_b
        |LIMIT 100""".stripMargin,
    // q76: the same value-based frame over truncated epoch seconds
    // (Spark's unix_timestamp truncates; epoch() keeps microseconds)
    "q76_rolling_window" ->
      """SELECT event_id, user_id,
        | count(*) OVER w AS roll_count,
        | round(sum(value) OVER w, 4) AS roll_sum,
        | round(avg(value) OVER w, 6) AS roll_avg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    // q77: change detection via lag (IS DISTINCT FROM = Spark's null-safe
    // <=> negated), interval close via lead over the surviving versions
    "q77_scd2" ->
      """WITH w AS (
        | SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
        |  lag(o_orderpriority) OVER ck AS prev,
        |  lag(o_orderdate) OVER ck AS prev_ts
        | FROM orders
        | WINDOW ck AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
        |v AS (
        | SELECT * FROM w
        | WHERE prev_ts IS NULL OR prev IS DISTINCT FROM o_orderpriority)
        |SELECT o_custkey, o_orderkey, o_orderpriority,
        | o_orderdate AS valid_from,
        | lead(o_orderdate) OVER ck AS valid_to,
        | lead(o_orderdate) OVER ck IS NULL AS is_current
        |FROM v
        |WINDOW ck AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin,
    // q78: full feature vector + sigmoid recomputed (weights restated);
    // explicit double casts against integer division
    "q78_quality_model" ->
      """WITH f AS (
        | SELECT doc_id,
        |  CAST(len(toks) AS DOUBLE) AS n,
        |  CAST(len(list_distinct(toks)) AS DOUBLE) AS uq,
        |  CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE) AS sl,
        |  CAST(len(list_filter(toks, t -> t IN ('the','a','and','of','to'))) AS DOUBLE) AS st
        | FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks FROM documents) d
        | WHERE len(toks) > 0),
        |z AS (
        | SELECT doc_id,
        |  -3.0 + 0.4 * ln(n + 1.0) + 2.0 * (uq / n) + 0.1 * (sl / n) + 4.0 * (st / n) AS z
        | FROM f)
        |SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 6) AS score,
        | 1.0 / (1.0 + exp(-z)) >= 0.5 AS keep
        |FROM z ORDER BY doc_id""".stripMargin,
    // q79: entropy from per-(doc, token) counts — H = (ln N − Σc·ln c / N)/ln 2
    "q79_token_entropy" ->
      """WITH c AS (
        | SELECT doc_id, token, count(*) AS c
        | FROM (SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS token
        |       FROM documents) u
        | GROUP BY doc_id, token),
        |e AS (
        | SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
        |  sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS sclc
        | FROM c GROUP BY doc_id)
        |SELECT doc_id, n_grams,
        | round((ln(CAST(n_grams AS DOUBLE)) - sclc / n_grams) / ln(2.0), 6) AS entropy_bits
        |FROM e ORDER BY doc_id""".stripMargin,
    // q80: quantile_cont IS the SQL-standard interpolated percentile the
    // engine computes exactly (q56 pins the semantics equivalence)
    "q80_winsorize" ->
      """WITH b AS (
        | SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.05) AS lo,
        |  quantile_cont(l_extendedprice, 0.95) AS hi
        | FROM lineitem GROUP BY l_returnflag)
        |SELECT l_orderkey, l_linenumber, l_returnflag,
        | round(least(greatest(l_extendedprice, lo), hi), 2) AS price_w,
        | least(greatest(l_extendedprice, lo), hi) <> l_extendedprice AS price_w_clipped
        |FROM lineitem JOIN b USING (l_returnflag)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // q81: smoothed KL over the union vocabulary, alpha = 0.5, identical
    // smoothing denominator (n + alpha·|V|)
    "q81_kl_divergence" ->
      """WITH c AS (
        | SELECT token,
        |  sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS cp,
        |  sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS cq
        | FROM (SELECT lang, unnest(string_split(lower(trim(text)), ' ')) AS token
        |       FROM documents WHERE lang IN ('en', 'de')) u
        | WHERE token <> ''
        | GROUP BY token),
        |v AS (SELECT CAST(count(*) AS DOUBLE) AS nv,
        |             CAST(sum(cp) AS BIGINT) AS np, CAST(sum(cq) AS BIGINT) AS nq FROM c)
        |SELECT 'en' AS p_slice, 'de' AS q_slice,
        | round(sum(p * ln(p / q)), 6) AS kl_divergence,
        | first(np) AS p_tokens, first(nq) AS q_tokens
        |FROM (
        | SELECT (cp + 0.5) / (np + 0.5 * nv) AS p,
        |        (cq + 0.5) / (nq + 0.5 * nv) AS q, np, nq
        | FROM c, v) t""".stripMargin,
    // q82: the standard one-pass co-moment aggregates
    "q82_corr_stats" ->
      """SELECT l_returnflag,
        | round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
        | round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
        | round(stddev_samp(l_extendedprice), 4) AS price_stddev,
        | round(var_samp(l_quantity), 4) AS qty_var
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // q83: the sketch must reproduce the plain exact top-k (capacity ≫
    // vocabulary ⇒ lossless; see operator contract for the general bound)
    "q83_heavy_hitters" ->
      """SELECT token, count(*) AS cnt
        |FROM (SELECT unnest(string_split(lower(trim(text)), ' ')) AS token
        |      FROM documents) u
        |WHERE token <> ''
        |GROUP BY token
        |ORDER BY cnt DESC, token
        |LIMIT 10""".stripMargin,
    // q84: greedy chain = strict-min chaining, stage by stage
    "q84_funnel" ->
      """WITH s1 AS (
        | SELECT user_id, min(ts) AS t1 FROM events
        | WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        | SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
        | WHERE event_type = 'click' AND ts > t1 GROUP BY e.user_id),
        |s3 AS (
        | SELECT e.user_id, min(ts) AS t3 FROM events e JOIN s2 USING (user_id)
        | WHERE event_type = 'purchase' AND ts > t2 GROUP BY e.user_id)
        |SELECT step, step_name, n_users FROM (
        | SELECT 1 AS step, 'view' AS step_name, count(*) AS n_users FROM s1
        | UNION ALL SELECT 2, 'click', count(*) FROM s2
        | UNION ALL SELECT 3, 'purchase', count(*) FROM s3) t
        |ORDER BY step""".stripMargin,
    // q85: brute-force all-pairs Levenshtein — the blocked join must
    // find the identical pair set (deletion neighborhoods have exact
    // recall at the verify threshold)
    "q85_edit_distance" ->
      """WITH n AS (SELECT DISTINCT p_name FROM part)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        | CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM n a JOIN n b ON a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY name_a, name_b""".stripMargin,
    // q86: melt restated as the portable UNION ALL (same rows, any engine)
    "q86_unpivot" ->
      """SELECT l_orderkey, l_linenumber, measure, value FROM (
        | SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
        |        CAST(l_quantity AS DOUBLE) AS value FROM lineitem
        | UNION ALL
        | SELECT l_orderkey, l_linenumber, 'l_extendedprice',
        |        CAST(l_extendedprice AS DOUBLE) FROM lineitem
        | UNION ALL
        | SELECT l_orderkey, l_linenumber, 'l_discount',
        |        CAST(l_discount AS DOUBLE) FROM lineitem) t
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,
    // q87: identical window family; DuckDB's rank-family returns BIGINT
    // (Spark side casts to long to match)
    "q87_rank_family" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        | rank() OVER w AS rnk,
        | dense_rank() OVER w AS drnk,
        | round(percent_rank() OVER w, 6) AS prnk,
        | round(cume_dist() OVER w, 6) AS cdist,
        | lag(o_totalprice, 1) OVER w AS prev_price,
        | lead(o_totalprice, 1) OVER w AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    // q88: calendar features; ISO day-of-week is the shared convention
    // (DuckDB isodow == Spark (dayofweek+5)%7+1)
    "q88_date_features" ->
      """SELECT o_orderkey, o_orderdate,
        | CAST(year(o_orderdate) AS INTEGER) AS yr,
        | CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        | CAST(month(o_orderdate) AS INTEGER) AS mo,
        | CAST(day(o_orderdate) AS INTEGER) AS dom,
        | CAST(isodow(o_orderdate) AS INTEGER) AS iso_dow,
        | CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
        | CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
        | CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        | last_day(o_orderdate) AS month_end,
        | CAST(datediff('day', o_orderdate, DATE '1998-12-31') AS INTEGER) AS days_to_eoy
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    // q89: the identical md5-parity sign matrix rebuilt in SQL; dot
    // products via the exploded join the engine avoids (0.25 = 1/√16
    // exactly, so the scale is bit-identical)
    "q89_random_projection" ->
      """WITH sign AS (
        | SELECT i, j,
        |  CASE WHEN CAST(('0x' || substring(md5(i || '_' || j), 1, 1)) AS BIGINT) % 2 = 0
        |       THEN 0.25 ELSE -0.25 END AS s
        | FROM (SELECT unnest(generate_series(0, 63)) AS i) a,
        |      (SELECT unnest(generate_series(0, 15)) AS j) b),
        |el AS (
        | SELECT vec_id, k, CAST(embedding[k] AS DOUBLE) AS e
        | FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS k) ks),
        |p AS (
        | SELECT vec_id, j, sum(e * s) AS p
        | FROM el JOIN sign ON el.k - 1 = sign.i
        | GROUP BY vec_id, j)
        |SELECT vec_id, CAST(j AS INTEGER) AS j, round(p, 6) AS p
        |FROM p ORDER BY vec_id, j""".stripMargin,
    // q90: exact top-k — full-probe IVF must reproduce it bit-for-bit
    // (same oracle shape as q27/q28; see q90IvfTopK doc)
    "q90_ivf_topk" ->
      """SELECT query_id, neighbour_id, round(c, 6) AS cosine_sim FROM (
        | SELECT q.vec_id AS query_id, c.vec_id AS neighbour_id,
        |  list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS c,
        |  row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
        |             c.vec_id ASC) AS rn
        | FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        | WHERE q.vec_id < 20) t
        |WHERE rn <= 5
        |ORDER BY query_id, neighbour_id""".stripMargin,
    // q91: each column's stats restated independently (count(col) is the
    // non-null count in both engines; distinct excludes nulls in both)
    "q91_table_profile" -> {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      cols.map { c =>
        s"""SELECT '$c' AS column_name, count(*) AS n_rows,
           | count(*) - count($c) AS n_nulls,
           | count(DISTINCT $c) AS n_distinct,
           | CAST(min($c) AS VARCHAR) AS min_value,
           | CAST(max($c) AS VARCHAR) AS max_value FROM orders""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    },
    // q92: the identical FULL JOIN; USING coalesces the key per the
    // SQL standard in both engines
    "q92_full_outer" ->
      """WITH s96 AS (
        | SELECT o_custkey, round(sum(o_totalprice), 2) AS spend_96 FROM orders
        | WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
        | GROUP BY o_custkey),
        |s97 AS (
        | SELECT o_custkey, round(sum(o_totalprice), 2) AS spend_97 FROM orders
        | WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01'
        | GROUP BY o_custkey)
        |SELECT o_custkey, spend_96, spend_97
        |FROM s96 FULL JOIN s97 USING (o_custkey)
        |ORDER BY o_custkey""".stripMargin,
    // q93: DuckDB ASOF with the <= inequality is the forward direction;
    // tie dedup = arg_min (first event_id wins, mirroring q41's arg_max)
    "q93_asof_forward" ->
      """SELECT e.event_id, e.user_id,
        | round(p.value, 4) AS next_purchase_value
        |FROM events e
        |ASOF LEFT JOIN (
        |  SELECT user_id, ts, arg_min(value, event_id) AS value
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY user_id, ts) p
        |  ON e.user_id = p.user_id AND e.ts <= p.ts
        |ORDER BY e.event_id""".stripMargin,
    // q94: both directions composed with the same pick rule the engine
    // documents (equal distance -> backward)
    "q94_asof_nearest" ->
      """SELECT e.event_id, e.user_id,
        | round(CASE WHEN f.ts IS NULL
        |            OR (b.ts IS NOT NULL AND e.ts - b.ts <= f.ts - e.ts)
        |       THEN b.value ELSE f.value END, 4) AS nearest_purchase_value
        |FROM events e
        |ASOF LEFT JOIN (
        |  SELECT user_id, ts, arg_max(value, event_id) AS value
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY user_id, ts) b
        |  ON e.user_id = b.user_id AND e.ts >= b.ts
        |ASOF LEFT JOIN (
        |  SELECT user_id, ts, arg_min(value, event_id) AS value
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY user_id, ts) f
        |  ON e.user_id = f.user_id AND e.ts <= f.ts
        |ORDER BY e.event_id""".stripMargin,
    // q95: q49's recursive closure + the keep-longest pick restated
    "q95_cluster_resolve" ->
      s"""WITH RECURSIVE pairs AS (${jaccardPairsSql("0.8")}),
         |edges AS (
         | SELECT id_a AS src, id_b AS dst FROM pairs
         | UNION SELECT id_b, id_a FROM pairs),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |reach(id, r) AS (
         | SELECT id, id FROM nodes
         | UNION
         | SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst),
         |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
         |best AS (
         | SELECT comp.component AS cluster_id, d.doc_id, d.n_chars,
         |  row_number() OVER (PARTITION BY comp.component
         |                     ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn,
         |  count(*) OVER (PARTITION BY comp.component) AS cluster_size
         | FROM comp JOIN documents d ON comp.id = d.doc_id)
         |SELECT cluster_id, doc_id AS best_id,
         | CAST(n_chars AS DOUBLE) AS best_score,
         | cluster_size, cluster_size - 1 AS n_dropped
         |FROM best WHERE rn = 1
         |ORDER BY cluster_id""".stripMargin,
    // q96: identical rank + floor(cumfrac·n) boundaries (same IEEE
    // double literals ⇒ same floors)
    "q96_stratified_split" ->
      """WITH r AS (
        | SELECT lang, doc_id,
        |  row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
        |  count(*) OVER (PARTITION BY lang) AS n
        | FROM documents)
        |SELECT lang, split, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM (
        | SELECT lang, doc_id,
        |  -- (0.8 + 0.1), not 0.9: the engine folds cumulative weights by
        |  -- summation, and the floor must see the bit-identical double
        |  CASE WHEN rk <= floor(0.8 * n) THEN 'train'
        |       WHEN rk <= floor((0.8 + 0.1) * n) THEN 'val'
        |       ELSE 'test' END AS split
        | FROM r) t
        |GROUP BY lang, split
        |ORDER BY lang, split""".stripMargin,
    // q97: same FULL JOIN + null-safe compare; count(*) is never null,
    // so side presence can ride on it in SQL (the engine uses explicit
    // markers for the general all-null-attribute case)
    "q97_snapshot_diff" ->
      """WITH o AS (
        | SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spend
        | FROM orders
        | WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
        | GROUP BY o_custkey),
        |n AS (
        | SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spend
        | FROM orders
        | WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01'
        | GROUP BY o_custkey)
        |SELECT o_custkey,
        | o.n_orders AS old_n_orders, o.spend AS old_spend,
        | n.n_orders AS new_n_orders, n.spend AS new_spend,
        | CASE WHEN o.n_orders IS NULL THEN 'added'
        |      WHEN n.n_orders IS NULL THEN 'removed'
        |      WHEN o.n_orders IS DISTINCT FROM n.n_orders
        |        OR o.spend IS DISTINCT FROM n.spend THEN 'changed'
        |      ELSE 'unchanged' END AS change_type
        |FROM o FULL JOIN n USING (o_custkey)
        |ORDER BY o_custkey""".stripMargin,
    // q98: integer bucket indices (floor(floor(epoch)/b) == floor(epoch/b)
    // for integer b), generate_series spine, IGNORE NULLS ffill with the
    // default up-to-current-row frame = the engine's rowsBetween
    "q98_gapfill_resample" ->
      """WITH b AS (
        | SELECT user_id, CAST(floor(epoch(ts) / 21600) AS BIGINT) AS idx,
        |  count(*) AS n_events, sum(value) AS sum_value
        | FROM events GROUP BY 1, 2),
        |spine AS (
        | SELECT user_id, unnest(generate_series(min(idx), max(idx))) AS idx
        | FROM b GROUP BY user_id),
        |j AS (
        | SELECT s.user_id, s.idx, coalesce(b.n_events, 0) AS n_events, b.sum_value
        | FROM spine s LEFT JOIN b ON s.user_id = b.user_id AND s.idx = b.idx)
        |SELECT user_id, idx * 21600 AS bucket_start, n_events,
        | round(sum_value, 4) AS sum_value,
        | round(last_value(sum_value IGNORE NULLS)
        |   OVER (PARTITION BY user_id ORDER BY idx), 4) AS filled_sum
        |FROM j
        |ORDER BY user_id, bucket_start""".stripMargin,
    // q99: the same two-window gaps-and-islands restated — running max
    // over strictly preceding rows opens islands, running sum numbers them
    "q99_merge_intervals" ->
      """WITH iv AS (
        | SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
        |  CAST(floor(epoch(ts)) AS BIGINT) + 1800 AS e
        | FROM events),
        |m AS (
        | SELECT user_id, s, e,
        |  max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        | FROM iv),
        |isl AS (
        | SELECT user_id, s, e,
        |  sum(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        | FROM m)
        |SELECT user_id, min(s) AS span_start, max(e) AS span_end,
        | count(*) AS n_intervals
        |FROM isl GROUP BY user_id, island
        |ORDER BY user_id, span_start""".stripMargin,
    // q100: identical lead window (event_id tie-break) + from-state
    // normalization over the aggregated matrix
    "q100_transitions" ->
      """WITH t AS (
        | SELECT event_type AS from_state,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_state
        | FROM events)
        |SELECT from_state, to_state, count(*) AS n_transitions,
        | round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY from_state), 6) AS p
        |FROM t WHERE to_state IS NOT NULL
        |GROUP BY from_state, to_state
        |ORDER BY from_state, to_state""".stripMargin,
    // q101: the pinned two-pass formula — group mean join, centered
    // power sums, population g1/g2 (built-in skewness/kurtosis
    // conventions differ between engines, so neither side uses them)
    "q101_moments" ->
      """WITH mu AS (
        | SELECT l_returnflag, avg(l_quantity) AS mu FROM lineitem GROUP BY 1),
        |c AS (
        | SELECT l.l_returnflag, mu.mu, l.l_quantity - mu.mu AS d
        | FROM lineitem l JOIN mu USING (l_returnflag))
        |SELECT l_returnflag, count(*) AS n, round(max(mu), 6) AS mean,
        | round(sqrt(sum(d*d) / nullif(count(*) - 1, 0)), 6) AS stddev,
        | round((sum(d*d*d) / count(*)) / nullif(pow(sum(d*d) / count(*), 1.5), 0), 6) AS skewness,
        | round((sum(d*d*d*d) / count(*)) / nullif(pow(sum(d*d) / count(*), 2), 0) - 3, 6) AS kurtosis
        |FROM c GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // q102: same tokenizer as the q23 family; windowed df + posting cap,
    // string_agg in numeric doc-id order = the engine's sorted concat_ws
    "q102_inverted_index" ->
      """WITH tok AS (
        | SELECT doc_id, unnest(list_distinct(string_split(lower(trim(text)), ' '))) AS token
        | FROM documents),
        |w AS (
        | SELECT token, doc_id,
        |  row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn,
        |  count(*) OVER (PARTITION BY token) AS doc_freq
        | FROM tok WHERE token <> '')
        |SELECT token, doc_freq,
        | string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        |FROM w WHERE doc_freq >= 5 AND rn <= 20
        |GROUP BY token, doc_freq
        |ORDER BY token""".stripMargin,
    // q103: q27's exact-top-k oracle with the metadata predicate applied
    // to the corpus side BEFORE ranking (pre-filter semantics)
    "q103_filtered_ann" ->
      """SELECT query_id, neighbour_id, round(c, 6) AS cosine_sim FROM (
        | SELECT q.vec_id AS query_id, c.vec_id AS neighbour_id,
        |  list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS c,
        |  row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
        |             c.vec_id ASC) AS rn
        | FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        | WHERE q.vec_id < 20 AND c.label = 3) t
        |WHERE rn <= 5
        |ORDER BY query_id, neighbour_id""".stripMargin,
    // q104: identical temperature arithmetic; the md5-bucket membership
    // threshold is quantized (round(p*10000)) so 1-ulp weight drift
    // between engines cannot flip a document
    "q104_temperature_sample" ->
      """WITH g AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY lang),
        |tot AS (SELECT sum(n_l) AS n FROM g),
        |w AS (SELECT lang, n_l, pow(n_l * 1.0 / (SELECT n FROM tot), 0.5) AS pw FROM g),
        |norm AS (SELECT sum(pw) AS z FROM w),
        |kp AS (SELECT lang, n_l,
        |  least(1.0, 300.0 * (pw / (SELECT z FROM norm)) / n_l) AS keep_p FROM w)
        |SELECT d.lang, max(kp.n_l) AS n_total, round(max(kp.keep_p), 6) AS keep_p,
        | count(*) AS n_kept, CAST(sum(d.doc_id) AS BIGINT) AS id_sum
        |FROM documents d JOIN kp ON d.lang = kp.lang
        |WHERE CAST(('0x' || substring(md5(coalesce(CAST(d.doc_id AS VARCHAR), '__graft_null_key__')), 1, 8)) AS BIGINT) % 10000
        |      < round(kp.keep_p * 10000)
        |GROUP BY d.lang
        |ORDER BY d.lang""".stripMargin,
    // q105: identical median/MAD arithmetic (DuckDB median ==
    // interpolated percentile 0.5 == Spark percentile); NULLIF pins the
    // MAD=0 degenerate case to NULL on both engines (Spark non-ANSI x/0
    // is NULL; DuckDB IEEE x/0 would be ±Inf and leak past the z cut)
    "q105_robust_outliers" ->
      """WITH m AS (
        | SELECT event_type, median(value) AS med FROM events GROUP BY 1),
        |d AS (
        | SELECT e.event_id, e.event_type, e.value, e.value - m.med AS sdev,
        |  abs(e.value - m.med) AS dev
        | FROM events e JOIN m USING (event_type)),
        |md AS (SELECT event_type, median(dev) AS mad FROM d GROUP BY 1)
        |SELECT d.event_id, d.event_type, round(d.value, 4) AS value,
        | round(0.6745 * d.sdev / nullif(md.mad, 0), 6) AS robust_z
        |FROM d JOIN md USING (event_type)
        |WHERE abs(0.6745 * d.sdev / nullif(md.mad, 0)) > 3.5
        |ORDER BY d.event_id""".stripMargin,
    "q106_topk_per_group" ->
      """SELECT o_custkey, rk, o_orderkey, round(o_totalprice, 2) AS o_totalprice
        |FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        | FROM orders) t
        |WHERE rk <= 3
        |ORDER BY o_custkey, rk""".stripMargin,
    "q107_share_of_total" ->
      """WITH rev AS (
        | SELECT r.r_name, n.n_name, sum(o.o_totalprice) AS rev
        | FROM customer c
        | JOIN orders o ON c.c_custkey = o.o_custkey
        | JOIN nation n ON c.c_nationkey = n.n_nationkey
        | JOIN region r ON n.n_regionkey = r.r_regionkey
        | GROUP BY 1, 2)
        |SELECT r_name, n_name, round(rev, 2) AS rev,
        | round(rev / sum(rev) OVER (PARTITION BY r_name), 6) AS region_share,
        | round(rev / sum(rev) OVER (), 6) AS total_share
        |FROM rev
        |ORDER BY r_name, n_name""".stripMargin,
    // q108: the engine writes a zone-mapped copy and scans it through
    // the pruning FileIndex; the oracle applies the same predicate to
    // the raw table — file skipping must be value-invisible
    "q108_zonemap_scan" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        | round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
        | round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS sum_price
        |FROM lineitem
        |WHERE l_orderkey >= 100 AND l_orderkey <= 1000
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // q109: the engine decodes real RIFF/WAVE PCM bytes; the oracle
    // restates the synthetic sample closed form — flat sample j of
    // audio i is ((i*31 + j*7) % 251) - 125, N = nFrames*channels.
    // Integer stats (peak, sum_sq, duration_us) must match exactly;
    // RMS to 6 rounded decimals (sqrt+divide are IEEE in both engines).
    "q109_audio_features" ->
      """SELECT r.i AS media_id,
        | CAST(8000 + (r.i % 4) * 4000 AS INT) AS sample_rate,
        | CAST(1 + (r.i % 2) AS INT) AS channels,
        | 16 AS bits,
        | CAST(200 + (r.i % 50) * 4 AS INT) AS n_frames,
        | CAST((200 + (r.i % 50) * 4) * 1000000 // (8000 + (r.i % 4) * 4000) AS BIGINT) AS duration_us,
        | CAST(max(abs((r.i * 31 + j.j * 7) % 251 - 125)) AS INT) AS peak,
        | CAST(sum(((r.i * 31 + j.j * 7) % 251 - 125) * ((r.i * 31 + j.j * 7) % 251 - 125)) AS BIGINT) AS sum_sq,
        | round(sqrt(CAST(sum(((r.i * 31 + j.j * 7) % 251 - 125) * ((r.i * 31 + j.j * 7) % 251 - 125)) AS DOUBLE) / count(*)), 6) AS rms
        |FROM range(300) r(i) CROSS JOIN range(792) j(j)
        |WHERE r.i % 3 = 1
        |  AND j.j < (200 + (r.i % 50) * 4) * (1 + (r.i % 2))
        |GROUP BY r.i
        |ORDER BY media_id""".stripMargin,
    // q110: the engine walks real ISO BMFF boxes; the oracle restates
    // the synth geometry closed forms (Multimodal.synthMp4Geom) —
    // every column is integer arithmetic in media_id, matched exactly
    "q110_video_metadata" ->
      """SELECT r.i AS media_id,
        | CASE WHEN r.i % 2 = 0 THEN 'avc1' ELSE 'hev1' END AS codec,
        | CAST(1000 + (r.i % 5) * 200 AS BIGINT) AS timescale,
        | CAST((8 + r.i % 4) * (40 + r.i % 7) AS BIGINT) AS duration_ticks,
        | CAST(64 + (r.i % 8) * 32 AS INT) AS width,
        | CAST(64 + (r.i % 5) * 32 AS INT) AS height,
        | CAST(8 + r.i % 4 AS INT) AS n_frames,
        | CAST((8 + r.i % 4) * (40 + r.i % 7) * 1000000 // (1000 + (r.i % 5) * 200) AS BIGINT) AS duration_us
        |FROM range(300) r(i)
        |WHERE r.i % 3 = 2
        |ORDER BY media_id""".stripMargin,
    // q111: same cell assignment as the q43 oracle, then SemDeDup
    // dominance as one NOT EXISTS — survivor iff no lower-id cell-mate
    // is >= threshold cosine-similar
    "q111_semantic_dedup" ->
      """WITH a AS (
        | SELECT vec_id, embedding, cid AS cell FROM (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |   row_number() OVER (PARTITION BY e.vec_id
        |     ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.ce::DOUBLE[]) DESC,
        |              c.cid ASC) AS rn
        |  FROM embeddings e,
        |       (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8) c) t
        | WHERE rn = 1)
        |SELECT x.vec_id, x.cell FROM a x
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM a y
        |  WHERE y.cell = x.cell AND y.vec_id < x.vec_id
        |    AND list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) >= 0.40)
        |ORDER BY x.vec_id""".stripMargin,
    // q112: identical MLE ratio arithmetic — c(w1,w2)/c(w1 as context),
    // doc score = weighted mean -log2 over the doc's own bigrams
    "q112_lm_crossentropy" ->
      """WITH toks AS (
        | SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents),
        |bg AS (
        | SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        | FROM toks, unnest(range(1, len(t))) AS u(i)),
        |d AS (SELECT doc_id, w1, w2, count(*) AS m FROM bg GROUP BY 1, 2, 3),
        |m12 AS (SELECT w1, w2, CAST(sum(m) AS BIGINT) AS c12 FROM d GROUP BY 1, 2),
        |m1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM m12 GROUP BY 1)
        |SELECT d.doc_id, CAST(sum(d.m) AS BIGINT) AS n_bigrams,
        | round(-sum(d.m * log2(m12.c12::DOUBLE / m1.c1)) / sum(d.m), 6) AS cross_entropy
        |FROM d
        |JOIN m12 ON d.w1 = m12.w1 AND d.w2 = m12.w2
        |JOIN m1 ON d.w1 = m1.w1
        |GROUP BY d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // q113: the same three power iterations unrolled — contribution
    // aggregate per step, teleport (1-0.85)/N, symmetrized edges
    "q113_pagerank" ->
      """WITH e0 AS (
        | SELECT DISTINCT 'p:' || l_partkey AS src, 's:' || l_suppkey AS dst
        | FROM lineitem),
        |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
        |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |r0 AS (SELECT id, 1.0::DOUBLE / nn.n AS pr FROM nodes, nn),
        |c1 AS (SELECT e.dst AS id, sum(r0.pr / deg.d) AS cin
        |       FROM e JOIN deg USING (src) JOIN r0 ON r0.id = e.src GROUP BY e.dst),
        |r1 AS (SELECT nodes.id, (1 - 0.85)::DOUBLE / nn.n + 0.85::DOUBLE * coalesce(c1.cin, 0) AS pr
        |       FROM nodes CROSS JOIN nn LEFT JOIN c1 ON c1.id = nodes.id),
        |c2 AS (SELECT e.dst AS id, sum(r1.pr / deg.d) AS cin
        |       FROM e JOIN deg USING (src) JOIN r1 ON r1.id = e.src GROUP BY e.dst),
        |r2 AS (SELECT nodes.id, (1 - 0.85)::DOUBLE / nn.n + 0.85::DOUBLE * coalesce(c2.cin, 0) AS pr
        |       FROM nodes CROSS JOIN nn LEFT JOIN c2 ON c2.id = nodes.id),
        |c3 AS (SELECT e.dst AS id, sum(r2.pr / deg.d) AS cin
        |       FROM e JOIN deg USING (src) JOIN r2 ON r2.id = e.src GROUP BY e.dst),
        |r3 AS (SELECT nodes.id, (1 - 0.85)::DOUBLE / nn.n + 0.85::DOUBLE * coalesce(c3.cin, 0) AS pr
        |       FROM nodes CROSS JOIN nn LEFT JOIN c3 ON c3.id = nodes.id)
        |SELECT id, round(pr * 1000, 6) AS pr_milli FROM r3 ORDER BY id""".stripMargin,
    // q117: the bitmap sketch is exact, so the sharded rollup must equal
    // a plain distinct re-scan; n_shards = distinct (event_type, day)
    // groups. q118 (HLL) has no SQL oracle — estimate is engine-specific.
    "q117_bitmap_distinct" ->
      """SELECT event_type,
        | count(DISTINCT CAST(ts AS DATE)) AS n_shards,
        | count(DISTINCT user_id) AS distinct_users
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // q118: banded oracle — DuckDB restates the EXACT side (shard count,
    // exact distinct); within_2pct is the engine-side verdict that the
    // HLL rollup estimate landed inside the lgK=12 band, asserted TRUE
    "q118_hll_rollup" ->
      """SELECT event_type,
        | count(DISTINCT CAST(ts AS DATE)) AS n_shards,
        | count(DISTINCT user_id) AS exact_distinct,
        | TRUE AS within_2pct
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // q119: the synth sample table in closed form — per = 256 // n bytes
    // per frame (last frame takes the remainder), one chunk, dts = k·delta,
    // mdat byte at flat index j = (i·31 + j·7) mod 251 as a signed byte
    "q119_frame_sample" ->
      """WITH v AS (
        | SELECT r.i AS media_id, CAST(8 + r.i % 4 AS INT) AS n,
        |  40 + r.i % 7 AS delta, 1000 + (r.i % 5) * 200 AS mts
        | FROM range(300) r(i) WHERE r.i % 3 = 2),
        |e AS (
        | SELECT media_id, n, delta, mts, CAST(u.k AS INT) AS k, 256 // n AS per,
        |  CASE WHEN u.k = n - 1 THEN 256 - (256 // n) * (n - 1) ELSE 256 // n END AS sz,
        |  u.k * (256 // n) AS rel
        | FROM v, unnest(range(0, v.n)) AS u(k)
        | WHERE u.k % 2 = 0)
        |SELECT e.media_id, e.k AS sample_idx, CAST(0 AS INT) AS chunk_idx,
        | CAST(e.sz AS BIGINT) AS size,
        | CAST(e.rel AS BIGINT) AS offset_in_chunk,
        | CAST(e.k * e.delta AS BIGINT) AS dts_ticks,
        | CAST((e.k * e.delta * 1000000) // e.mts AS BIGINT) AS dts_us,
        | TRUE AS sync,
        | CAST((SELECT sum(CASE WHEN m > 127 THEN m - 256 ELSE m END)
        |       FROM (SELECT (e.media_id * 31 + j.j * 7) % 251 AS m
        |             FROM unnest(range(e.rel, e.rel + e.sz)) AS j(j)) q)
        |      AS BIGINT) AS byte_sum
        |FROM e
        |ORDER BY media_id, sample_idx""".stripMargin,
    // q120: banded oracle — DuckDB restates the exact rank-order
    // statistics at the sketch's own rank convention (rank =
    // floor(q*(n-1)+0.5), row 1-based); the within_alpha verdicts are
    // the engine-side DDSketch α-guarantee, asserted TRUE
    "q120_quantile_sketch" ->
      """WITH v AS (
        | SELECT event_type, value AS v FROM events
        | WHERE value IS NOT NULL AND NOT isnan(value)),
        |r AS (
        | SELECT event_type, v,
        |  row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS n
        | FROM v),
        |t AS (
        | SELECT event_type,
        |  max(CASE WHEN rn = CAST(floor(0.5 * (n - 1) + 0.5) AS BIGINT) + 1 THEN v END) AS e50,
        |  max(CASE WHEN rn = CAST(floor(0.95 * (n - 1) + 0.5) AS BIGINT) + 1 THEN v END) AS e95,
        |  max(CASE WHEN rn = CAST(floor(0.99 * (n - 1) + 0.5) AS BIGINT) + 1 THEN v END) AS e99
        | FROM r GROUP BY 1),
        |s AS (SELECT event_type, count(DISTINCT CAST(ts AS DATE)) AS n_shards
        |      FROM events GROUP BY 1)
        |SELECT event_type, n_shards,
        | round(e50, 6) AS exact_p50, round(e95, 6) AS exact_p95,
        | round(e99, 6) AS exact_p99,
        | TRUE AS p50_within_alpha, TRUE AS p95_within_alpha,
        | TRUE AS p99_within_alpha
        |FROM t JOIN s USING (event_type)
        |ORDER BY event_type""".stripMargin,
    // q121: same double-precision per-subspace argmin over the 16
    // reference vectors' subvectors; row_number tie-break = lowest j,
    // matching encodeVec's strict-< first-wins scan. DuckDB lists are
    // 1-based: subspace s, dim t -> element s*8 + t + 1.
    "q121_pq_encode" ->
      """WITH cb AS (
        | SELECT vec_id AS j, embedding AS cv FROM embeddings WHERE vec_id < 16),
        |d AS (
        | SELECT e.vec_id, s.s AS subspace, cb.j,
        |  sum((CAST(e.embedding[s.s * 8 + t.t + 1] AS DOUBLE)
        |       - CAST(cb.cv[s.s * 8 + t.t + 1] AS DOUBLE)) ^ 2) AS d2
        | FROM embeddings e, unnest(range(8)) AS s(s), cb, unnest(range(8)) AS t(t)
        | GROUP BY 1, 2, 3),
        |r AS (
        | SELECT vec_id, subspace, j,
        |  row_number() OVER (PARTITION BY vec_id, subspace ORDER BY d2, j) AS rn
        | FROM d)
        |SELECT vec_id, CAST(subspace AS INT) AS subspace, CAST(j AS INT) AS code
        |FROM r WHERE rn = 1
        |ORDER BY vec_id, subspace""".stripMargin,
    // q122: banded oracle — DuckDB restates the exact L2 top-10 id list
    // per query (list_distance ordering = squared-L2 ordering, id
    // tie-break, self included to match the ADC corpus scan); recall_ok
    // is the engine-side verdict that PQ's refined result recovered
    // >= 7 of those 10, asserted TRUE
    "q122_pq_adc" ->
      """WITH d AS (
        | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_distance(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS dist
        | FROM embeddings q, embeddings c
        | WHERE q.vec_id < 5),
        |r AS (
        | SELECT query_id, neighbor_id,
        |  row_number() OVER (PARTITION BY query_id
        |    ORDER BY dist ASC, neighbor_id ASC) AS rn
        | FROM d)
        |SELECT query_id,
        | md5(string_agg(CAST(neighbor_id AS VARCHAR), ',' ORDER BY rn)) AS exact_top10_md5,
        | TRUE AS recall_ok
        |FROM r WHERE rn <= 10
        |GROUP BY query_id
        |ORDER BY query_id""".stripMargin,
    // q123: the q27-convention top-10 per query, label-match relevance,
    // then the TREC arithmetic verbatim — gain 1/log2(rank+1) (grade 1),
    // IDCG over ranks 1..min(k, n_rel): range(n) is 0-based so the
    // rank-r term is 1/log2(i+2)
    "q123_retrieval_metrics" ->
      """WITH topk AS (
        | SELECT query_id, neighbour_id, rn FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbour_id,
        |   row_number() OVER (PARTITION BY q.vec_id
        |     ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
        |              c.vec_id ASC) AS rn
        |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 5) t
        | WHERE rn <= 10),
        |lab AS (SELECT vec_id, label FROM embeddings),
        |rel AS (
        | SELECT q.vec_id AS query_id, c.vec_id AS doc_id
        | FROM lab q JOIN lab c ON q.label = c.label AND q.vec_id <> c.vec_id
        | WHERE q.vec_id < 5),
        |tot AS (SELECT query_id, count(*) AS n_rel FROM rel GROUP BY 1),
        |hits AS (
        | SELECT t.query_id, t.rn,
        |  CASE WHEN r.doc_id IS NULL THEN 0 ELSE 1 END AS g
        | FROM topk t LEFT JOIN rel r
        |   ON t.query_id = r.query_id AND t.neighbour_id = r.doc_id),
        |agg AS (
        | SELECT query_id, sum(g) AS n_rel_ret,
        |  sum(g * 1.0 / log2(rn + 1)) AS dcg,
        |  max(CASE WHEN g = 1 THEN 1.0 / rn ELSE 0 END) AS mrr
        | FROM hits GROUP BY 1),
        |ideal AS (
        | SELECT tot.query_id,
        |  (SELECT sum(1.0 / log2(i.i + 2))
        |   FROM unnest(range(least(10, tot.n_rel))) i(i)) AS idcg
        | FROM tot)
        |SELECT a.query_id,
        | CAST(tot.n_rel AS BIGINT) AS n_relevant_total,
        | CAST(a.n_rel_ret AS BIGINT) AS n_relevant_retrieved,
        | round(a.n_rel_ret / 10.0, 6) AS precision_k,
        | round(a.n_rel_ret * 1.0 / tot.n_rel, 6) AS recall_k,
        | round(a.mrr, 6) AS mrr,
        | round(a.dcg / ideal.idcg, 6) AS ndcg
        |FROM agg a JOIN tot USING (query_id) JOIN ideal USING (query_id)
        |ORDER BY query_id""".stripMargin,
    // q124: banded oracle — DuckDB restates the whitespace-normalized
    // lowercase original (md5 + word count); lossless is the engine-side
    // verdict that detokenizing the BPE output reproduces it, asserted
    // TRUE (documents carry no exotic whitespace, verified per-SF)
    "q124_bpe_tokenize" ->
      """WITH n AS (
        | SELECT doc_id,
        |  array_to_string(list_filter(
        |    regexp_split_to_array(lower(trim(text)), '\s+'), w -> len(w) > 0),
        |    ' ') AS norm
        | FROM documents)
        |SELECT doc_id, md5(norm) AS norm_md5,
        | len(list_filter(string_split(norm, ' '), w -> len(w) > 0)) AS n_words,
        | TRUE AS lossless
        |FROM n
        |ORDER BY doc_id""".stripMargin,
    // q125: identical bin arithmetic (floor((v-lo)/((hi-lo)/10)) clamped
    // to [0,9], baseline bounds), full-outer bin alignment, eps floor
    // 1e-6, natural logs
    "q125_drift_psi" ->
      """WITH b AS (
        | SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
        | WHERE ts < TIMESTAMP '2024-01-15'),
        |c AS (
        | SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
        | WHERE ts >= TIMESTAMP '2024-01-15'),
        |bounds AS (SELECT event_type, min(v) AS lo, max(v) AS hi FROM b GROUP BY 1),
        |bb AS (
        | SELECT b.event_type,
        |  CASE WHEN hi = lo THEN 0
        |       ELSE least(9, greatest(0, CAST(floor((v - lo) / ((hi - lo) / 10)) AS INT))) END AS bin,
        |  count(*) AS nb
        | FROM b JOIN bounds USING (event_type) GROUP BY 1, 2),
        |cc AS (
        | SELECT c.event_type,
        |  CASE WHEN hi = lo THEN 0
        |       ELSE least(9, greatest(0, CAST(floor((v - lo) / ((hi - lo) / 10)) AS INT))) END AS bin,
        |  count(*) AS nc
        | FROM c JOIN bounds USING (event_type) GROUP BY 1, 2),
        |al AS (
        | SELECT coalesce(bb.event_type, cc.event_type) AS event_type,
        |  coalesce(bb.bin, cc.bin) AS bin,
        |  coalesce(nb, 0) AS nb, coalesce(nc, 0) AS nc
        | FROM bb FULL JOIN cc ON bb.event_type = cc.event_type AND bb.bin = cc.bin),
        |tot AS (SELECT event_type, sum(nb) AS tb, sum(nc) AS tc FROM al GROUP BY 1),
        |fr AS (
        | SELECT al.event_type, bin,
        |  greatest(CAST(nb AS DOUBLE) / tb, 1e-6) AS ef,
        |  greatest(CAST(nc AS DOUBLE) / tc, 1e-6) AS af
        | FROM al JOIN tot USING (event_type))
        |SELECT event_type, count(*) AS n_bins,
        | round(sum((af - ef) * ln(af / ef)), 6) AS psi,
        | round(sum(af * ln(af / ef)), 6) AS kl
        |FROM fr GROUP BY 1
        |ORDER BY 1""".stripMargin,
    // q126: both synchronous iterations unrolled — neighbour label votes,
    // (count desc, label asc) winner, isolated fallthrough via coalesce
    "q126_label_prop" ->
      """WITH e0 AS (
        | SELECT DISTINCT 'p:' || l_partkey AS src, 's:' || l_suppkey AS dst
        | FROM lineitem),
        |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |l0 AS (SELECT id, id AS label FROM nodes),
        |v1 AS (SELECT e.src AS id, l0.label, count(*) AS n
        |       FROM e JOIN l0 ON l0.id = e.dst GROUP BY 1, 2),
        |w1 AS (SELECT id, label FROM (
        |        SELECT id, label,
        |         row_number() OVER (PARTITION BY id ORDER BY n DESC, label ASC) AS rn
        |        FROM v1) t WHERE rn = 1),
        |l1 AS (SELECT l0.id, coalesce(w1.label, l0.label) AS label
        |       FROM l0 LEFT JOIN w1 ON w1.id = l0.id),
        |v2 AS (SELECT e.src AS id, l1.label, count(*) AS n
        |       FROM e JOIN l1 ON l1.id = e.dst GROUP BY 1, 2),
        |w2 AS (SELECT id, label FROM (
        |        SELECT id, label,
        |         row_number() OVER (PARTITION BY id ORDER BY n DESC, label ASC) AS rn
        |        FROM v2) t WHERE rn = 1),
        |l2 AS (SELECT l1.id, coalesce(w2.label, l1.label) AS label
        |       FROM l1 LEFT JOIN w2 ON w2.id = l1.id)
        |SELECT id, label FROM l2 ORDER BY id""".stripMargin,
    // q127: the bitmap intersection is exact, so the oracle is the plain
    // distinct-user intersection across the two halves
    "q127_retention" ->
      """WITH p1 AS (
        | SELECT DISTINCT event_type, user_id FROM events
        | WHERE ts < TIMESTAMP '2024-01-15'),
        |p2 AS (
        | SELECT DISTINCT event_type, user_id FROM events
        | WHERE ts >= TIMESTAMP '2024-01-15'),
        |a AS (SELECT event_type, count(*) AS n1 FROM p1 GROUP BY 1),
        |b AS (SELECT event_type, count(*) AS n2 FROM p2 GROUP BY 1),
        |r AS (SELECT p1.event_type, count(*) AS ret
        |      FROM p1 JOIN p2 USING (event_type, user_id) GROUP BY 1)
        |SELECT a.event_type, a.n1 AS users_p1, b.n2 AS users_p2,
        | coalesce(r.ret, 0) AS retained,
        | round(CAST(coalesce(r.ret, 0) AS DOUBLE) / a.n1, 6) AS retention_rate
        |FROM a JOIN b USING (event_type) LEFT JOIN r USING (event_type)
        |ORDER BY event_type""".stripMargin,
    // q128: banded oracle — DuckDB restates q125's exact fixed-width
    // PSI arithmetic verbatim; within_band / verdict_agree are the
    // engine-side verdicts comparing the sketch PSI against it (band
    // 0.25; shared 0.25 major-drift threshold), asserted TRUE
    "q128_sketch_drift" ->
      """WITH b AS (
        | SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
        | WHERE ts < TIMESTAMP '2024-01-15'),
        |c AS (
        | SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
        | WHERE ts >= TIMESTAMP '2024-01-15'),
        |bounds AS (SELECT event_type, min(v) AS lo, max(v) AS hi FROM b GROUP BY 1),
        |bb AS (
        | SELECT b.event_type,
        |  CASE WHEN hi = lo THEN 0
        |       ELSE least(9, greatest(0, CAST(floor((v - lo) / ((hi - lo) / 10)) AS INT))) END AS bin,
        |  count(*) AS nb
        | FROM b JOIN bounds USING (event_type) GROUP BY 1, 2),
        |cc AS (
        | SELECT c.event_type,
        |  CASE WHEN hi = lo THEN 0
        |       ELSE least(9, greatest(0, CAST(floor((v - lo) / ((hi - lo) / 10)) AS INT))) END AS bin,
        |  count(*) AS nc
        | FROM c JOIN bounds USING (event_type) GROUP BY 1, 2),
        |al AS (
        | SELECT coalesce(bb.event_type, cc.event_type) AS event_type,
        |  coalesce(bb.bin, cc.bin) AS bin,
        |  coalesce(nb, 0) AS nb, coalesce(nc, 0) AS nc
        | FROM bb FULL JOIN cc ON bb.event_type = cc.event_type AND bb.bin = cc.bin),
        |tot AS (SELECT event_type, sum(nb) AS tb, sum(nc) AS tc FROM al GROUP BY 1),
        |fr AS (
        | SELECT al.event_type, bin,
        |  greatest(CAST(nb AS DOUBLE) / tb, 1e-6) AS ef,
        |  greatest(CAST(nc AS DOUBLE) / tc, 1e-6) AS af
        | FROM al JOIN tot USING (event_type))
        |SELECT event_type,
        | round(sum((af - ef) * ln(af / ef)), 6) AS psi_exact,
        | TRUE AS within_band, TRUE AS verdict_agree
        |FROM fr GROUP BY 1
        |ORDER BY 1""".stripMargin,
    // q129: exact per-node triangle counts — brute-force ordered
    // triangles x<y<z over the undirected co-order edge set (each
    // triangle once), exploded back to its three corners
    "q129_triangles" ->
      """WITH ps AS (
        | SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (
        | SELECT DISTINCT x.p AS a, y.p AS b
        | FROM ps x JOIN ps y ON x.o = y.o AND x.p < y.p),
        |tri AS (
        | SELECT e1.a AS x, e1.b AS y, e2.b AS z
        | FROM e e1
        | JOIN e e2 ON e2.a = e1.b
        | JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |pern AS (
        | SELECT id, count(*) AS t FROM (
        |  SELECT x AS id FROM tri
        |  UNION ALL SELECT y FROM tri
        |  UNION ALL SELECT z FROM tri) u
        | GROUP BY 1),
        |deg AS (
        | SELECT id, count(*) AS degree FROM (
        |  SELECT a AS id FROM e UNION ALL SELECT b FROM e) d
        | GROUP BY 1)
        |SELECT deg.id AS part_id, deg.degree,
        | coalesce(pern.t, 0) AS triangles,
        | CASE WHEN deg.degree >= 2
        |      THEN round(2.0 * coalesce(pern.t, 0) / (deg.degree * (deg.degree - 1.0)), 6)
        |      ELSE 0.0 END AS lcc
        |FROM deg LEFT JOIN pern ON pern.id = deg.id
        |ORDER BY part_id""".stripMargin,
    // q130: the whole DSIR pipeline replayed — filter-first single-space
    // tokens, unigrams + adjacent bigrams, md5-prefix bucket (q25
    // convention) mod 1024, Laplace α = 1 models, per-doc log-ratio sum
    "q130_dsir_weights" ->
      """WITH tok AS (
        | SELECT doc_id, lang,
        |  list_filter(string_split(lower(trim(text)), ' '), t -> t <> '') AS tk
        | FROM documents),
        |g0 AS (
        | SELECT doc_id, lang, unnest(tk) AS g FROM tok
        | UNION ALL
        | SELECT doc_id, lang, tk[j] || ' ' || tk[j+1] AS g
        | FROM (SELECT doc_id, lang, tk,
        |        unnest(generate_series(1, len(tk) - 1)) AS j FROM tok) x),
        |gb AS (
        | SELECT doc_id, lang,
        |  CAST(('0x' || substring(md5(g), 1, 8)) AS BIGINT) % 1024 AS b
        | FROM g0),
        |db AS (SELECT doc_id, b, count(*) AS c FROM gb GROUP BY 1, 2),
        |tc AS (SELECT b, count(*) AS ct FROM gb WHERE lang = 'en' GROUP BY 1),
        |rc AS (SELECT b, count(*) AS cr FROM gb GROUP BY 1),
        |tt AS (SELECT CAST(count(*) AS DOUBLE) AS nt FROM gb WHERE lang = 'en'),
        |tr AS (SELECT CAST(count(*) AS DOUBLE) AS nr FROM gb)
        |SELECT db.doc_id,
        | CAST(sum(db.c) AS BIGINT) AS n_grams,
        | round(sum(db.c * (ln((coalesce(tc.ct, 0) + 1.0) / (tt.nt + 1024.0))
        |                 - ln((rc.cr + 1.0) / (tr.nr + 1024.0)))), 6) AS weight
        |FROM db
        |LEFT JOIN tc USING (b)
        |JOIN rc USING (b), tt, tr
        |GROUP BY db.doc_id
        |ORDER BY doc_id""".stripMargin,
    // q131: the KMV estimator replayed exactly — 60-bit md5-prefix
    // hashes, k-smallest per (event_type, half), θ = u(256th) when
    // full else 1, cardinality n-or-255/θ, set ops at θ = min over the
    // strict θ-cut samples. Deterministic hash ⇒ exact match.
    "q131_kmv_retention" ->
      """WITH h AS (
        | SELECT DISTINCT event_type, (ts < TIMESTAMP '2024-01-15') AS p1,
        |  CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        | FROM events WHERE user_id IS NOT NULL),
        |r AS (
        | SELECT event_type, p1, hv,
        |  row_number() OVER (PARTITION BY event_type, p1 ORDER BY hv) AS rn,
        |  count(*) OVER (PARTITION BY event_type, p1) AS n
        | FROM h),
        |kept AS (SELECT * FROM r WHERE rn <= 256),
        |half AS (
        | SELECT event_type, p1, max(n) AS n,
        |  CASE WHEN max(n) >= 256
        |       THEN max(CASE WHEN rn = 256 THEN hv END) / 1152921504606846976.0
        |       ELSE 1.0 END AS theta
        | FROM kept GROUP BY 1, 2),
        |est AS (
        | SELECT event_type, p1,
        |  CASE WHEN n < 256 THEN CAST(n AS DOUBLE) ELSE 255.0 / theta END AS card
        | FROM half),
        |t2 AS (
        | SELECT event_type,
        |  least(coalesce(max(CASE WHEN p1 THEN theta END), 1.0),
        |        coalesce(max(CASE WHEN NOT p1 THEN theta END), 1.0)) AS theta
        | FROM half GROUP BY 1),
        |sa AS (SELECT k.event_type, k.hv FROM kept k JOIN t2 USING (event_type)
        |       WHERE k.p1 AND k.hv / 1152921504606846976.0 < t2.theta),
        |sb AS (SELECT k.event_type, k.hv FROM kept k JOIN t2 USING (event_type)
        |       WHERE NOT k.p1 AND k.hv / 1152921504606846976.0 < t2.theta),
        |ii AS (SELECT sa.event_type, count(*) AS ni
        |       FROM sa JOIN sb USING (event_type, hv) GROUP BY 1),
        |uu AS (SELECT event_type, count(DISTINCT hv) AS nu
        |       FROM (SELECT * FROM sa UNION ALL SELECT * FROM sb) u GROUP BY 1)
        |SELECT t2.event_type,
        | round(coalesce(ea.card, 0.0), 6) AS est_p1,
        | round(coalesce(eb.card, 0.0), 6) AS est_p2,
        | round(coalesce(ii.ni, 0) / t2.theta, 6) AS est_retained,
        | round(coalesce(uu.nu, 0) / t2.theta, 6) AS est_either
        |FROM t2
        |LEFT JOIN est ea ON ea.event_type = t2.event_type AND ea.p1
        |LEFT JOIN est eb ON eb.event_type = t2.event_type AND NOT eb.p1
        |LEFT JOIN ii ON ii.event_type = t2.event_type
        |LEFT JOIN uu ON uu.event_type = t2.event_type
        |ORDER BY t2.event_type""".stripMargin,
    // q132: top-20 exact candidates per query (q27 ordering convention),
    // label-match positives removed, negative ranks re-densified, top 5
    "q132_hard_negatives" ->
      """WITH cand AS (
        | SELECT q.vec_id AS query_id, c.vec_id AS neighbour_id,
        |  q.label AS ql, c.label AS cl,
        |  list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cs,
        |  row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
        |             c.vec_id ASC) AS rn
        | FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        | WHERE q.vec_id < 5),
        |neg AS (
        | SELECT query_id, neighbour_id, cs,
        |  row_number() OVER (PARTITION BY query_id ORDER BY rn) AS neg_rank
        | FROM cand WHERE rn <= 20 AND ql <> cl)
        |SELECT query_id, neg_rank, neighbour_id, round(cs, 6) AS cosine_sim
        |FROM neg WHERE neg_rank <= 5
        |ORDER BY query_id, neg_rank""".stripMargin,
    // q133: every CMS cell rebuilt in SQL — row-i bucket of token t is
    // md5(i || ':' || t) first-8-hex mod 2048; cell totals sum the full
    // vocabulary's counts; the estimate is the min over the 4 rows
    "q133_cms_freq" ->
      """WITH toks AS (
        | SELECT unnest(list_filter(string_split(lower(trim(text)), ' '),
        |         t -> t <> '')) AS token
        | FROM documents),
        |cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS exact
        |        FROM toks GROUP BY 1),
        |top AS (SELECT token, exact FROM cnt ORDER BY exact DESC, token LIMIT 30),
        |cell AS (
        | SELECT r.i,
        |  CAST(('0x' || substring(md5(CAST(r.i AS VARCHAR) || ':' || cnt.token), 1, 8))
        |   AS BIGINT) % 2048 AS b,
        |  CAST(sum(cnt.exact) AS BIGINT) AS total
        | FROM cnt, generate_series(0, 3) r(i)
        | GROUP BY 1, 2),
        |probe AS (
        | SELECT t.token, t.exact, r.i,
        |  CAST(('0x' || substring(md5(CAST(r.i AS VARCHAR) || ':' || t.token), 1, 8))
        |   AS BIGINT) % 2048 AS b
        | FROM top t, generate_series(0, 3) r(i))
        |SELECT p.token, p.exact, min(c.total) AS cms_est
        |FROM probe p JOIN cell c ON c.i = p.i AND c.b = p.b
        |GROUP BY 1, 2
        |ORDER BY exact DESC, token""".stripMargin,
    // q134: every pooled cell recomputed from the closed-form synthetic
    // pixels — byte at logical position p of image i is (i*31 + 7p) mod
    // 251, rows are BGR (r at x*3+2), cell of pixel x is x*4 // w
    "q134_image_pool" -> poolClosedFormOracle,
    // q135: the same md5 permutation as a window — hex strings compare
    // identically (ASCII) in both engines; doc_id breaks (never-seen)
    // md5 ties
    "q135_corpus_shuffle" ->
      """SELECT doc_id,
        | row_number() OVER (ORDER BY md5('ep0:' || CAST(doc_id AS VARCHAR)), doc_id)
        |  - 1 AS position
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    // q136: decode replayed in closed form — audio ids are i%3=1,
    // channels 1+i%2, frames 200+(i%50)*4, channel-0 flat sample index
    // n*channels, value (i*31+7j)%251-125; angle left-associated
    // exactly as the engine builds it
    "q136_audio_spectrum" ->
      """WITH a AS (
        | SELECT r.i AS media_id, CAST(1 + r.i % 2 AS INT) AS ch,
        |  CAST(200 + (r.i % 50) * 4 AS INT) AS nf
        | FROM range(300) r(i) WHERE r.i % 3 = 1),
        |x AS (
        | SELECT media_id, nf, CAST(nn.n AS INT) AS n,
        |  CAST(((media_id * 31 + 7 * (nn.n * ch)) % 251) - 125 AS DOUBLE) AS v
        | FROM a, unnest(range(0, a.nf)) nn(n)),
        |s AS (
        | SELECT media_id, b.bin, nf,
        |  sum(v * cos(2 * pi() * b.bin * n / nf)) AS c,
        |  sum(v * sin(2 * pi() * b.bin * n / nf)) AS sn
        | FROM x, (SELECT unnest([1, 2, 4, 8]) AS bin) b
        | GROUP BY 1, 2, 3)
        |SELECT media_id, CAST(bin AS INT) AS bin,
        | round(ln(1.0 + (c * c + sn * sn) / CAST(nf * nf AS DOUBLE)), 6) AS log_power
        |FROM s
        |ORDER BY media_id, bin""".stripMargin,
    // q137: the CM inner-product estimator replayed — per-row bucket
    // totals over each side's full key-frequency table, row-wise
    // product sums, min over the 4 rows; exact sizes from the count
    // tables directly
    "q137_join_cardinality" ->
      """WITH cl AS (SELECT l_orderkey AS k, count(*) AS c FROM lineitem GROUP BY 1),
        |co AS (SELECT o_orderkey AS k, count(*) AS c FROM orders GROUP BY 1),
        |cp AS (SELECT l_partkey AS k, count(*) AS c FROM lineitem GROUP BY 1),
        |cellL AS (
        | SELECT r.i,
        |  CAST(('0x' || substring(md5(CAST(r.i AS VARCHAR) || ':' || CAST(k AS VARCHAR)), 1, 8))
        |   AS BIGINT) % 4096 AS b,
        |  CAST(sum(c) AS BIGINT) AS t
        | FROM cl, generate_series(0, 3) r(i) GROUP BY 1, 2),
        |cellO AS (
        | SELECT r.i,
        |  CAST(('0x' || substring(md5(CAST(r.i AS VARCHAR) || ':' || CAST(k AS VARCHAR)), 1, 8))
        |   AS BIGINT) % 4096 AS b,
        |  CAST(sum(c) AS BIGINT) AS t
        | FROM co, generate_series(0, 3) r(i) GROUP BY 1, 2),
        |cellP AS (
        | SELECT r.i,
        |  CAST(('0x' || substring(md5(CAST(r.i AS VARCHAR) || ':' || CAST(k AS VARCHAR)), 1, 8))
        |   AS BIGINT) % 4096 AS b,
        |  CAST(sum(c) AS BIGINT) AS t
        | FROM cp, generate_series(0, 3) r(i) GROUP BY 1, 2),
        |est1 AS (
        | SELECT CAST(min(s) AS BIGINT) AS e FROM (
        |  SELECT l.i, sum(l.t * o.t) AS s
        |  FROM cellL l JOIN cellO o ON o.i = l.i AND o.b = l.b GROUP BY 1) x),
        |est2 AS (
        | SELECT CAST(min(s) AS BIGINT) AS e FROM (
        |  SELECT i, sum(t * t) AS s FROM cellP GROUP BY 1) x),
        |ex1 AS (SELECT CAST(sum(cl.c * co.c) AS BIGINT) AS e
        |        FROM cl JOIN co USING (k)),
        |ex2 AS (SELECT CAST(sum(c * c) AS BIGINT) AS e FROM cp)
        |SELECT 'lineitem_orders_orderkey' AS join_key, ex1.e AS exact, est1.e AS cms_est
        |FROM ex1, est1
        |UNION ALL
        |SELECT 'lineitem_self_partkey', ex2.e, est2.e FROM ex2, est2
        |ORDER BY join_key""".stripMargin,
    // q138: the bottom-k pick replayed — distinct stringified keys
    // ranked by (60-bit md5-prefix hash, key), first 5 per group
    "q138_group_sample" ->
      """WITH u AS (
        | SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS us
        | FROM events WHERE user_id IS NOT NULL),
        |rk AS (
        | SELECT event_type, us,
        |  row_number() OVER (PARTITION BY event_type
        |   ORDER BY CAST(('0x' || substring(md5(us), 1, 15)) AS BIGINT), us) AS rn
        | FROM u)
        |SELECT event_type, CAST(rn - 1 AS BIGINT) AS pos, us AS user_id_str
        |FROM rk WHERE rn <= 5
        |ORDER BY event_type, pos""".stripMargin,
    // q139: both peel rounds unrolled — degrees over the current edge
    // set, survivors deg >= 90, edges restricted to survivors, repeat;
    // output = degrees over the round-2 subgraph
    "q139_kcore" ->
      """WITH ps AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e0 AS (SELECT DISTINCT x.p AS a, y.p AS b
        |       FROM ps x JOIN ps y ON x.o = y.o AND x.p < y.p),
        |d1 AS (SELECT id, count(*) AS d FROM (
        |        SELECT a AS id FROM e0 UNION ALL SELECT b FROM e0) u GROUP BY 1),
        |s1 AS (SELECT id FROM d1 WHERE d >= 90),
        |e1 AS (SELECT e0.a, e0.b FROM e0
        |       JOIN s1 x ON x.id = e0.a JOIN s1 y ON y.id = e0.b),
        |d2 AS (SELECT id, count(*) AS d FROM (
        |        SELECT a AS id FROM e1 UNION ALL SELECT b FROM e1) u GROUP BY 1),
        |s2 AS (SELECT id FROM d2 WHERE d >= 90),
        |e2 AS (SELECT e1.a, e1.b FROM e1
        |       JOIN s2 x ON x.id = e1.a JOIN s2 y ON y.id = e1.b)
        |SELECT id AS part_id, count(*) AS degree FROM (
        | SELECT a AS id FROM e2 UNION ALL SELECT b FROM e2) u
        |GROUP BY 1
        |ORDER BY part_id""".stripMargin,
    // q140: the Hilbert walk unrolled one SQL level per bit by the same
    // generator the spec cross-checks against the codegen'd expression
    "q140_hilbert" -> (graft.operators.Layout.hilbertSqlLevels(
      Seq("x", "y"), "x", "y", 8,
      "(SELECT CAST(l_orderkey % 256 AS BIGINT) AS x, " +
        "CAST(l_partkey % 256 AS BIGINT) AS y " +
        "FROM lineitem WHERE l_orderkey < 3000) base") +
      " ORDER BY h, x, y"),
    // q141: both runs and the fusion replayed — token-keyed overlap
    // counts (only docs sharing >= 1 token are retrieved, the posting-
    // list semantics), ranks with doc tie-break, q27-convention cosine
    // ranks, 1/(60+r) contributions summed over the union, re-ranked,
    // top 10
    "q141_rrf_fusion" ->
      """WITH tok AS (
        | SELECT doc_id,
        |  unnest(list_distinct(list_filter(string_split(lower(trim(text)), ' '),
        |   t -> t <> ''))) AS token
        | FROM documents),
        |ov AS (
        | SELECT q.doc_id AS query_id, d.doc_id, count(*) AS overlap
        | FROM tok q JOIN tok d USING (token)
        | WHERE q.doc_id < 5 AND d.doc_id <> q.doc_id
        | GROUP BY 1, 2),
        |lex AS (
        | SELECT query_id, doc_id,
        |  row_number() OVER (PARTITION BY query_id
        |   ORDER BY overlap DESC, doc_id ASC) AS rnk
        | FROM ov),
        |vec AS (
        | SELECT e.vec_id AS query_id, c.vec_id AS doc_id,
        |  row_number() OVER (PARTITION BY e.vec_id
        |   ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
        |            c.vec_id ASC) AS rnk
        | FROM embeddings e JOIN embeddings c ON e.vec_id <> c.vec_id
        | WHERE e.vec_id < 5),
        |uni AS (
        | SELECT query_id, doc_id, 1.0 / (60 + rnk) AS c FROM lex WHERE rnk <= 20
        | UNION ALL
        | SELECT query_id, doc_id, 1.0 / (60 + rnk) FROM vec WHERE rnk <= 20),
        |fused AS (
        | SELECT query_id, doc_id, sum(c) AS rrf_score,
        |  CAST(count(*) AS BIGINT) AS n_runs
        | FROM uni GROUP BY 1, 2),
        |ranked AS (
        | SELECT query_id, doc_id, rrf_score, n_runs,
        |  row_number() OVER (PARTITION BY query_id
        |   ORDER BY rrf_score DESC, doc_id ASC) AS fr
        | FROM fused)
        |SELECT query_id, CAST(fr AS BIGINT) AS fused_rank, doc_id,
        | round(rrf_score, 6) AS rrf_score, n_runs
        |FROM ranked WHERE fr <= 10
        |ORDER BY query_id, fused_rank""".stripMargin,
    // q142: q43's assignment + distinct-token df tables + the lift
    // arithmetic and per-cluster rank, replayed end to end
    "q142_cluster_labels" ->
      """WITH a AS (
        | SELECT vec_id, cid AS cluster FROM (
        |  SELECT e.vec_id, c.cid,
        |   row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.ce::DOUBLE[]) DESC,
        |             c.cid ASC) AS rn
        |  FROM embeddings e,
        |       (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8) c) t
        | WHERE rn = 1),
        |tok AS (
        | SELECT doc_id,
        |  unnest(list_distinct(list_filter(string_split(lower(trim(text)), ' '),
        |   x -> x <> ''))) AS token
        | FROM documents),
        |mem AS (SELECT d.doc_id, a.cluster
        |        FROM (SELECT doc_id FROM documents) d JOIN a ON a.vec_id = d.doc_id),
        |nc AS (SELECT cluster, count(*) AS n_c FROM mem GROUP BY 1),
        |nd AS (SELECT count(*) AS n FROM mem),
        |dfc AS (SELECT m.cluster, t.token, CAST(count(*) AS BIGINT) AS df_c
        |        FROM tok t JOIN mem m ON m.doc_id = t.doc_id GROUP BY 1, 2),
        |dfa AS (SELECT token, count(*) AS df_all FROM tok GROUP BY 1),
        |l AS (
        | SELECT dfc.cluster, dfc.token, dfc.df_c,
        |  (CAST(dfc.df_c AS DOUBLE) / nc.n_c) / (CAST(dfa.df_all AS DOUBLE) / nd.n) AS lift
        | FROM dfc JOIN nc USING (cluster) JOIN dfa USING (token), nd
        | WHERE dfc.df_c >= 3),
        |r AS (
        | SELECT cluster, token, df_c, lift,
        |  row_number() OVER (PARTITION BY cluster ORDER BY lift DESC, token ASC) AS rnk
        | FROM l)
        |SELECT cluster, CAST(rnk AS BIGINT) AS lift_rank, token, df_c,
        | round(lift, 6) AS lift
        |FROM r WHERE rnk <= 5
        |ORDER BY cluster, lift_rank""".stripMargin,
    // q143: gaps-and-islands sessionization (30-min inactivity), ordered
    // string_agg path assembly with event_id tie-breaks, top-20 paths
    "q143_session_paths" ->
      """WITH m AS (
        | SELECT user_id, event_id, event_type, ts,
        |  CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS nw
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        | SELECT user_id, event_id, event_type, ts,
        |  sum(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        | FROM m),
        |p AS (
        | SELECT user_id, sess,
        |  string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        | FROM s GROUP BY 1, 2)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
        |FROM p GROUP BY 1
        |ORDER BY n_sessions DESC, path ASC
        |LIMIT 20""".stripMargin,
    // q144: the bitmap windows are exact, so the oracle is the plain
    // rolling COUNT(DISTINCT) over a trailing 7-day range join
    "q144_rolling_mau" ->
      """WITH du AS (
        | SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        | FROM events WHERE user_id IS NOT NULL),
        |days AS (SELECT DISTINCT day FROM du)
        |SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS n_distinct
        |FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    // q145: the bitmap matrix is exact — oracle = membership-join
    // COUNT(DISTINCT) per (cohort, offset); Monday-truncated weeks in
    // both engines, offsets exact multiples of 7 days
    "q145_cohort_matrix" ->
      """WITH act AS (
        | SELECT DISTINCT CAST(date_trunc('week', ts) AS DATE) AS period, user_id
        | FROM events WHERE user_id IS NOT NULL),
        |coh AS (SELECT user_id, min(period) AS cohort FROM act GROUP BY 1),
        |cs AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size
        |       FROM coh GROUP BY 1),
        |cells AS (
        | SELECT cs.cohort,
        |  CAST(datediff('day', cs.cohort, p.period) / 7 AS BIGINT) AS week_offset
        | FROM cs, (SELECT DISTINCT period FROM act) p
        | WHERE datediff('day', cs.cohort, p.period) BETWEEN 0 AND 28),
        |r AS (
        | SELECT c.cohort,
        |  CAST(datediff('day', c.cohort, a.period) / 7 AS BIGINT) AS week_offset,
        |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS retained
        | FROM coh c JOIN act a ON a.user_id = c.user_id
        | WHERE datediff('day', c.cohort, a.period) BETWEEN 0 AND 28
        | GROUP BY 1, 2)
        |SELECT cells.cohort, cells.week_offset, cs.cohort_size,
        | CAST(coalesce(r.retained, 0) AS BIGINT) AS retained,
        | round(CAST(coalesce(r.retained, 0) AS DOUBLE) / cs.cohort_size, 6) AS rate
        |FROM cells
        |JOIN cs USING (cohort)
        |LEFT JOIN r ON r.cohort = cells.cohort AND r.week_offset = cells.week_offset
        |ORDER BY cells.cohort, cells.week_offset""".stripMargin,
    // q146: the q84 strict-min chaining CTEs carried through to times —
    // lags in exact integer microseconds, quantile_cont percentiles
    "q146_conversion_lag" ->
      """WITH e AS (
        | SELECT user_id, event_type, ts FROM events
        | WHERE event_type IN ('view', 'click', 'purchase')),
        |a AS (SELECT user_id, min(ts) AS t1 FROM e
        |      WHERE event_type = 'view' GROUP BY 1),
        |b AS (SELECT e.user_id, min(e.ts) AS t2, min(a.t1) AS t1
        |      FROM e JOIN a USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ts > a.t1 GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t3, min(b.t1) AS t1
        |      FROM e JOIN b USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts > b.t2 GROUP BY 1),
        |d AS (SELECT epoch_us(t3) - epoch_us(t1) AS lag_us FROM c)
        |SELECT CAST(count(*) AS BIGINT) AS n_converters,
        | round(quantile_cont(lag_us, 0.5), 6) AS p50_us,
        | round(quantile_cont(lag_us, 0.9), 6) AS p90_us,
        | CAST(max(lag_us) AS BIGINT) AS max_us
        |FROM d""".stripMargin,
    // q147: the whole pipeline replayed — every 20-char gram's md5,
    // corpus-wide occurrence counts, duplicated positions, and the
    // gaps-and-islands merge to maximal 1-based inclusive spans
    "q147_substring_dedup" ->
      """WITH g AS (
        | SELECT doc_id, CAST(p.p AS BIGINT) AS pos,
        |  md5(substr(text, CAST(p.p AS INT), 20)) AS h
        | FROM documents, unnest(generate_series(1, len(text) - 19)) AS p(p)
        | WHERE len(text) >= 20),
        |dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
        |d AS (SELECT doc_id, pos FROM g JOIN dup USING (h)),
        |r AS (
        | SELECT doc_id, pos,
        |  pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        | FROM d),
        |sp0 AS (
        | SELECT doc_id, min(pos) AS s0, max(pos) + 19 AS e0
        | FROM r GROUP BY doc_id, grp),
        |pm AS (
        | SELECT doc_id, s0, e0,
        |  max(e0) OVER (PARTITION BY doc_id ORDER BY s0, e0
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        | FROM sp0),
        |isl AS (
        | SELECT doc_id, s0, e0,
        |  sum(CASE WHEN prev_max IS NULL OR s0 > prev_max THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY doc_id ORDER BY s0, e0
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        | FROM pm)
        |SELECT doc_id, min(s0) AS span_start, max(e0) AS span_end,
        | max(e0) - min(s0) + 1 AS span_len
        |FROM isl GROUP BY doc_id, isl
        |ORDER BY doc_id, span_start""".stripMargin,
    // q148: MG at capacity >= distinct items degenerates to exact
    // per-window counts in (est desc, item asc) order — restated as a
    // ranked GROUP BY; rank is posexplode's 0-based position
    "q148_windowed_heavy_hitters" ->
      """WITH c AS (
        | SELECT CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS VARCHAR) AS window_start,
        |  event_type AS item, count(*) AS n
        | FROM events GROUP BY 1, 2)
        |SELECT window_start,
        | CAST(row_number() OVER (PARTITION BY window_start
        |   ORDER BY n DESC, item ASC) - 1 AS BIGINT) AS rank,
        | item, CAST(n AS BIGINT) AS n_events
        |FROM c
        |ORDER BY window_start, rank""".stripMargin,
    // q149: exact bitmap distinct per tumbling day == plain
    // COUNT(DISTINCT) per day
    "q149_windowed_distinct" ->
      """SELECT CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS VARCHAR) AS window_start,
        | count(DISTINCT user_id) AS n_distinct
        |FROM events
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    // q150: the q120 banded pattern per day window — exact rank-order
    // statistics at rank floor(q*(n-1)+0.5), verdicts asserted TRUE
    "q150_windowed_quantiles" ->
      """WITH v AS (
        | SELECT CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS VARCHAR) AS window_start,
        |  value AS v
        | FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
        |r AS (
        | SELECT window_start, v,
        |  row_number() OVER (PARTITION BY window_start ORDER BY v) AS rn,
        |  count(*) OVER (PARTITION BY window_start) AS n
        | FROM v)
        |SELECT window_start,
        | round(max(CASE WHEN rn = CAST(floor(0.5 * (n - 1) + 0.5) AS BIGINT) + 1 THEN v END), 6) AS exact_p50,
        | round(max(CASE WHEN rn = CAST(floor(0.95 * (n - 1) + 0.5) AS BIGINT) + 1 THEN v END), 6) AS exact_p95,
        | round(max(CASE WHEN rn = CAST(floor(0.99 * (n - 1) + 0.5) AS BIGINT) + 1 THEN v END), 6) AS exact_p99,
        | TRUE AS p50_within_alpha, TRUE AS p95_within_alpha,
        | TRUE AS p99_within_alpha
        |FROM r GROUP BY window_start
        |ORDER BY window_start""".stripMargin,
    // q151: q147's spans re-derived, then the splice replayed — each
    // span contributes the gap before it (lag over span starts), the
    // tail follows the last span; docs without spans pass through
    "q151_substring_cut" ->
      """WITH g AS (
        | SELECT doc_id, CAST(p.p AS BIGINT) AS pos,
        |  md5(substr(text, CAST(p.p AS INT), 20)) AS h
        | FROM documents, unnest(generate_series(1, len(text) - 19)) AS p(p)
        | WHERE len(text) >= 20),
        |dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
        |d AS (SELECT doc_id, pos FROM g JOIN dup USING (h)),
        |r AS (
        | SELECT doc_id, pos,
        |  pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        | FROM d),
        |sp0 AS (
        | SELECT doc_id, min(pos) AS s0, max(pos) + 19 AS e0
        | FROM r GROUP BY doc_id, grp),
        |pm AS (
        | SELECT doc_id, s0, e0,
        |  max(e0) OVER (PARTITION BY doc_id ORDER BY s0, e0
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        | FROM sp0),
        |isl AS (
        | SELECT doc_id, s0, e0,
        |  sum(CASE WHEN prev_max IS NULL OR s0 > prev_max THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY doc_id ORDER BY s0, e0
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        | FROM pm),
        |sp AS (
        | SELECT doc_id, min(s0) AS s, max(e0) AS e
        | FROM isl GROUP BY doc_id, isl),
        |seg AS (
        | SELECT doc_id, s, e,
        |  lag(e, 1, 0) OVER (PARTITION BY doc_id ORDER BY s) AS prev_e
        | FROM sp),
        |kept AS (
        | SELECT doc.doc_id,
        |  coalesce(string_agg(
        |    substr(doc.text, CAST(seg.prev_e + 1 AS INT),
        |           CAST(seg.s - seg.prev_e - 1 AS INT)),
        |    '' ORDER BY seg.s), '')
        |  || substr(doc.text, CAST(coalesce(max(seg.e), 0) + 1 AS INT)) AS clean,
        |  CAST(count(seg.s) AS BIGINT) AS n_spans,
        |  len(doc.text) AS orig_len
        | FROM documents doc LEFT JOIN seg ON seg.doc_id = doc.doc_id
        | GROUP BY doc.doc_id, doc.text)
        |SELECT doc_id, md5(clean) AS clean_md5, n_spans,
        | CAST(orig_len - len(clean) AS BIGINT) AS chars_removed
        |FROM kept
        |ORDER BY doc_id""".stripMargin,
    // q152: the q122 banded pattern — exact L2 top-10 restated, the
    // recall_ok verdict covers both approximation layers (cell probe +
    // residual PQ), asserted TRUE
    "q152_ivfpq" ->
      """WITH d AS (
        | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_distance(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS dist
        | FROM embeddings q, embeddings c
        | WHERE q.vec_id < 5),
        |r AS (
        | SELECT query_id, neighbor_id,
        |  row_number() OVER (PARTITION BY query_id
        |    ORDER BY dist ASC, neighbor_id ASC) AS rn
        | FROM d)
        |SELECT query_id,
        | md5(string_agg(CAST(neighbor_id AS VARCHAR), ',' ORDER BY rn)) AS exact_top10_md5,
        | TRUE AS recall_ok
        |FROM r WHERE rn <= 10
        |GROUP BY query_id
        |ORDER BY query_id""".stripMargin,
    // q153: the mapGroupsWithState fold in batch mode == plain GROUP BY
    "q153_stateful_agg" ->
      """SELECT user_id, count(*) AS n_events,
        | round(max(value), 6) AS max_value
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    // q154: both per-column profiles as UNION ALL rows, full-outer
    // classification (added/removed/common), null rates + distincts
    "q154_profile_diff" ->
      """WITH o AS (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-15'),
        |nw AS (
        | SELECT event_id, user_id, event_type, value,
        |  round(value * 2, 2) AS value2
        | FROM events WHERE ts >= TIMESTAMP '2024-01-15'),
        |po AS (
        | SELECT 'event_id' AS column_name, count(*) - count(event_id) AS nn,
        |  count(DISTINCT event_id) AS nd, count(*) AS n FROM o
        | UNION ALL SELECT 'user_id', count(*) - count(user_id),
        |  count(DISTINCT user_id), count(*) FROM o
        | UNION ALL SELECT 'event_type', count(*) - count(event_type),
        |  count(DISTINCT event_type), count(*) FROM o
        | UNION ALL SELECT 'value', count(*) - count(value),
        |  count(DISTINCT value), count(*) FROM o
        | UNION ALL SELECT 'props', count(*) - count(props),
        |  count(DISTINCT props), count(*) FROM o),
        |pn AS (
        | SELECT 'event_id' AS column_name, count(*) - count(event_id) AS nn,
        |  count(DISTINCT event_id) AS nd, count(*) AS n FROM nw
        | UNION ALL SELECT 'user_id', count(*) - count(user_id),
        |  count(DISTINCT user_id), count(*) FROM nw
        | UNION ALL SELECT 'event_type', count(*) - count(event_type),
        |  count(DISTINCT event_type), count(*) FROM nw
        | UNION ALL SELECT 'value', count(*) - count(value),
        |  count(DISTINCT value), count(*) FROM nw
        | UNION ALL SELECT 'value2', count(*) - count(value2),
        |  count(DISTINCT value2), count(*) FROM nw)
        |SELECT coalesce(po.column_name, pn.column_name) AS column_name,
        | CASE WHEN po.column_name IS NULL THEN 'added'
        |      WHEN pn.column_name IS NULL THEN 'removed'
        |      ELSE 'common' END AS status,
        | round(CAST(po.nn AS DOUBLE) / po.n, 6) AS null_rate_old,
        | round(CAST(pn.nn AS DOUBLE) / pn.n, 6) AS null_rate_new,
        | CAST(po.nd AS BIGINT) AS distinct_old,
        | CAST(pn.nd AS BIGINT) AS distinct_new
        |FROM po FULL JOIN pn ON po.column_name = pn.column_name
        |ORDER BY column_name""".stripMargin,
    // q155: per-(event_type, hour) baseline mean/stddev_samp from the
    // first half, |z| >= 3 rows from the second; degenerate baselines
    // (n < 2 or zero variance) never flag
    "q155_seasonal_anomalies" ->
      """WITH b AS (
        | SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS hour_of_day,
        |  value
        | FROM events WHERE ts < TIMESTAMP '2024-01-15'),
        |c AS (
        | SELECT event_id, event_type,
        |  CAST(extract(hour FROM ts) AS BIGINT) AS hour_of_day, value
        | FROM events WHERE ts >= TIMESTAMP '2024-01-15'),
        |st AS (
        | SELECT event_type, hour_of_day, avg(value) AS m,
        |  stddev_samp(value) AS s, count(value) AS n
        | FROM b GROUP BY 1, 2)
        |SELECT event_id, c.event_type, c.hour_of_day, value,
        | round((value - m) / s, 6) AS z
        |FROM c JOIN st USING (event_type, hour_of_day)
        |WHERE n >= 2 AND s > 0 AND abs((value - m) / s) >= 3
        |ORDER BY event_id""".stripMargin,
    // q156: q48's interval join as LEFT OUTER — unattributed purchases
    // keep a row with null view_id
    "q156_unattributed" ->
      """WITH v AS (
        | SELECT user_id AS v_user, ts AS view_time, event_id AS view_id
        | FROM events WHERE event_type = 'view'),
        |p AS (
        | SELECT user_id AS p_user, ts AS purchase_time,
        |  event_id AS purchase_id, value
        | FROM events WHERE event_type = 'purchase')
        |SELECT purchase_id, view_id, p_user AS user_id,
        | round(value, 4) AS purchase_value
        |FROM p LEFT JOIN v
        | ON p_user = v_user AND view_time <= purchase_time
        | AND view_time >= purchase_time - INTERVAL 30 MINUTE
        |ORDER BY purchase_id, view_id""".stripMargin,
    // q157: gear-hash boundary rule (first 8 md5 hex chars as unsigned
    // int, mod 64) + segment assembly replayed — cuts, the non-empty
    // tail, lag-based starts, chunk md5s
    "q157_cdc_chunks" ->
      """WITH cuts AS (
        | SELECT doc_id, CAST(p.p + 7 AS BIGINT) AS e
        | FROM documents, unnest(generate_series(1, len(text) - 7)) AS p(p)
        | WHERE len(text) >= 8
        |  AND CAST(('0x' || substring(md5(substr(text, CAST(p.p AS INT), 8)), 1, 8)) AS BIGINT) % 64 = 0),
        |allends AS (
        | SELECT doc_id, e FROM cuts
        | UNION ALL
        | SELECT d.doc_id, CAST(len(d.text) AS BIGINT) FROM documents d
        | WHERE len(d.text) > 0 AND NOT EXISTS (
        |  SELECT 1 FROM cuts c
        |  WHERE c.doc_id = d.doc_id AND c.e = len(d.text))),
        |seg AS (
        | SELECT doc_id, e,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY e) - 1 AS chunk_idx,
        |  coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY e), 0) + 1 AS s
        | FROM allends)
        |SELECT seg.doc_id, chunk_idx, s AS chunk_start,
        | e - s + 1 AS chunk_len,
        | md5(substr(d.text, CAST(s AS INT), CAST(e - s + 1 AS INT))) AS chunk_md5
        |FROM seg JOIN documents d ON d.doc_id = seg.doc_id
        |WHERE e >= s
        |ORDER BY seg.doc_id, chunk_idx""".stripMargin,
    // q158: the whole linkage replayed in DuckDB — same corruption,
    // same sorted-character blocking (keys never cross engines; they
    // only have to induce the same blocks), DuckDB's OWN
    // jaro_winkler_similarity (the parity target the expression is
    // pinned to), same ppm quantization, same (score desc, id) top-1.
    "q158_record_linkage" ->
      """WITH dirty AS (
        | SELECT c_custkey AS dirty_id,
        |  substr(c_name, 1, p - 1) || substr(c_name, p + 1, 1) ||
        |  substr(c_name, p, 1) || substr(c_name, p + 2) AS dirty_name
        | FROM (SELECT c_custkey, c_name,
        |        CAST(10 + c_custkey % 8 AS INT) AS p FROM customer)),
        |kd AS (
        | SELECT dirty_id, dirty_name,
        |  array_to_string(list_sort(string_split_regex(dirty_name, '')), '') AS k
        | FROM dirty),
        |kc AS (
        | SELECT c_custkey AS match_id, c_name,
        |  array_to_string(list_sort(string_split_regex(c_name, '')), '') AS k
        | FROM customer),
        |scored AS (
        | SELECT dirty_id, match_id,
        |  CAST(floor(jaro_winkler_similarity(dirty_name, c_name) * 1e6) AS BIGINT) AS score_ppm
        | FROM kd JOIN kc USING (k))
        |SELECT dirty_id, match_id, score_ppm
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY dirty_id ORDER BY score_ppm DESC, match_id) AS rn
        |      FROM scored WHERE score_ppm >= 850000)
        |WHERE rn = 1
        |ORDER BY dirty_id""".stripMargin,
    // q159: components via recursive SQL (q49's oracle shape), then the
    // q45 bucket replay applied to the representative id
    "q159_leakage_safe_split" ->
      s"""WITH RECURSIVE pairs AS (${jaccardPairsSql("0.8")}),
         |edges AS (
         | SELECT id_a AS src, id_b AS dst FROM pairs
         | UNION SELECT id_b, id_a FROM pairs),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |reach(id, r) AS (
         | SELECT id, id FROM nodes
         | UNION
         | SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst),
         |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
         |rep AS (
         | SELECT d.doc_id, coalesce(c.component, d.doc_id) AS rep_id
         | FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
         |SELECT doc_id, rep_id,
         | CASE WHEN b < 8000 THEN 'train'
         |      WHEN b < 9000 THEN 'val'
         |      ELSE 'test' END AS split
         |FROM (SELECT doc_id, rep_id,
         |       CAST(('0x' || substring(md5(CAST(rep_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS b
         |      FROM rep) t
         |ORDER BY doc_id""".stripMargin,
    // q160: counts, ppm shares and ceil-salt restated in the same
    // integer arithmetic (DuckDB // == Spark div on bigints)
    "q160_key_skew_profile" ->
      """WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS N, count(*) AS D FROM c)
        |SELECT user_id, cnt, cnt * 1000000 // N AS share_ppm,
        | (cnt * D + N - 1) // N AS salt_factor
        |FROM c CROSS JOIN t
        |ORDER BY cnt DESC, user_id
        |LIMIT 50""".stripMargin,
    // q161: the three count tables rebuilt from the same hash-train
    // partition, the backoff CASE replayed with explicit DOUBLE casts
    // (DuckDB 0.4 is DECIMAL; JVM alpha is double — cast before
    // multiplying so both engines run the identical IEEE ops)
    "q161_stupid_backoff" ->
      """WITH docs AS (
        | SELECT doc_id, text,
        |  CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS b
        | FROM documents),
        |tr AS (SELECT string_split(lower(trim(text)), ' ') AS t FROM docs WHERE b < 9000),
        |te AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM docs WHERE b >= 9000),
        |c3 AS (SELECT t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3, count(*) AS c3
        |       FROM tr, unnest(range(1, len(t) - 1)) AS u(i) GROUP BY 1, 2, 3),
        |c2 AS (SELECT t[i] AS wa, t[i+1] AS wb, count(*) AS c2
        |       FROM tr, unnest(range(1, len(t))) AS u(i) GROUP BY 1, 2),
        |c1 AS (SELECT t[i] AS w, count(*) AS c1
        |       FROM tr, unnest(range(1, len(t) + 1)) AS u(i) GROUP BY 1),
        |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS T FROM c1),
        |trows AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3, count(*) AS m
        |          FROM te, unnest(range(1, len(t) - 1)) AS u(i) GROUP BY 1, 2, 3, 4),
        |sc AS (SELECT r.doc_id, r.m,
        |        CASE WHEN g3.c3 IS NOT NULL THEN g3.c3::DOUBLE / g2c.c2
        |             WHEN g2b.c2 IS NOT NULL
        |              THEN CAST(0.4 AS DOUBLE) * g2b.c2::DOUBLE / g1c.c1
        |             ELSE CAST(0.4 AS DOUBLE) * CAST(0.4 AS DOUBLE) *
        |                  coalesce(g1t.c1, 1)::DOUBLE / tot.T END AS s
        |       FROM trows r
        |       LEFT JOIN c3 g3 ON r.w1 = g3.w1 AND r.w2 = g3.w2 AND r.w3 = g3.w3
        |       LEFT JOIN c2 g2c ON r.w1 = g2c.wa AND r.w2 = g2c.wb
        |       LEFT JOIN c2 g2b ON r.w2 = g2b.wa AND r.w3 = g2b.wb
        |       LEFT JOIN c1 g1c ON r.w2 = g1c.w
        |       LEFT JOIN c1 g1t ON r.w3 = g1t.w
        |       CROSS JOIN tot)
        |SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_trigrams,
        | round(-sum(m * log2(s)) / sum(m), 6) AS sb_cost
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q162: the integer mixture plan (desired = ppm*total div 1e6,
    // base = desired div n, threshold = rem*1e4 div n) and the per-row
    // hash spread restated verbatim
    "q162_mixture_rebalance" ->
      """WITH tgt(dom, ppm) AS (VALUES
        |  ('en', 400000), ('zh', 250000), ('de', 150000),
        |  ('fr', 120000), ('es', 80000)),
        |c AS (SELECT lang, count(*) AS n_d FROM documents GROUP BY lang),
        |g AS (SELECT count(*) AS total FROM documents),
        |plan AS (
        | SELECT lang, (ppm * total) // 1000000 AS desired, n_d
        | FROM c JOIN tgt ON c.lang = tgt.dom CROSS JOIN g),
        |p2 AS (SELECT lang, desired // n_d AS copies_base,
        |        ((desired % n_d) * 10000) // n_d AS extra_thr FROM plan)
        |SELECT d.doc_id, d.lang,
        | copies_base + CASE WHEN
        |   CAST(('0x' || substring(md5(d.lang || ':' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
        |   < extra_thr THEN 1 ELSE 0 END AS n_copies
        |FROM documents d JOIN p2 ON d.lang = p2.lang
        |ORDER BY d.doc_id""".stripMargin,
    // q163: every dHash bit reconstructed from the closed-form pixel
    // generator — integer luma, cross-multiplied cell comparison, hex
    // nibbles assembled most-significant-first
    "q163_image_dhash" -> dhashClosedFormOracle,
    // q164: both bit grids rebuilt (raw and +24-clamped), hamming =
    // count of differing bits — no sign-bit arithmetic anywhere
    "q164_dhash_invariance" ->
      s"""WITH ${dhashBitCtes("", 0)},
         |${dhashBitCtes("s_", 24)}
         |SELECT a.media_id,
         | CAST(sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS BIGINT) AS hamming
         |FROM bits a JOIN s_bits b
         |  ON a.media_id = b.media_id AND a.cy = b.cy AND a.cx = b.cx
         |GROUP BY a.media_id
         |ORDER BY a.media_id""".stripMargin,
    // q165: the SAME aggregate straight off the parquet table — a hash
    // match means the ORC write+read preserved every row, type, and null
    "q165_orc_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        | round(sum(o_totalprice), 2) AS total_price,
        | count(DISTINCT o_custkey) AS n_customers
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // q166: identical RANGE window over integer epoch seconds
    // (epoch_us // 1e6 — integer micros, no double rounding)
    "q166_bot_rate_gate" ->
      """WITH ev AS (
        | SELECT user_id, epoch_us(ts) // 1000000 AS sec FROM events),
        |b AS (
        | SELECT user_id, count(*) OVER (
        |   PARTITION BY user_id ORDER BY sec
        |   RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW) AS burst
        | FROM ev)
        |SELECT user_id, count(*) AS n_events, max(burst) AS max_burst_24h,
        | max(burst) >= 9 AS bot_flag
        |FROM b GROUP BY user_id ORDER BY user_id""".stripMargin,
    // q167: both exact rankings recomputed with list slicing; overlap
    // count is pure integers once the two top-10 sets are fixed
    "q167_matryoshka_recall" ->
      s"""WITH qf AS (SELECT vec_id, embedding::DOUBLE[] AS e
         |            FROM embeddings WHERE vec_id < 20),
         |cf AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |fr AS (${matryoshkaRankSql("")}),
         |tr AS (${matryoshkaRankSql("[1:16]")})
         |SELECT f.query_id, count(*) AS hits_at_10
         |FROM (SELECT query_id, neighbour_id FROM fr WHERE rn <= 10) f
         |JOIN (SELECT query_id, neighbour_id FROM tr WHERE rn <= 10) t2
         |  ON f.query_id = t2.query_id AND f.neighbour_id = t2.neighbour_id
         |GROUP BY f.query_id
         |ORDER BY f.query_id""".stripMargin,
    // q168: both snapshots restated from parquet — the hash match pins
    // the commit/marker/resolve protocol, not just the aggregates
    "q168_time_travel" ->
      """SELECT CAST(0 AS BIGINT) AS version, count(*) AS n_orders,
        | round(sum(o_totalprice), 2) AS total_price
        |FROM orders WHERE o_totalprice < 100000
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), count(*), round(sum(o_totalprice), 2)
        |FROM orders
        |ORDER BY version""".stripMargin,
    "q169_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS class_size,
        | count(*) < 5 AS k_violation
        |FROM customer
        |GROUP BY c_nationkey, c_mktsegment
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    // q170: same md5 bucket/sign arithmetic over token occurrences;
    // zero-sum (fully cancelled) buckets dropped on both sides
    "q170_hashed_features" ->
      """WITH tok AS (
        | SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS w
        | FROM documents WHERE doc_id < 2000),
        |h AS (
        | SELECT doc_id,
        |  CAST(('0x' || substring(md5(w), 1, 8)) AS BIGINT) % 256 AS bucket,
        |  CASE WHEN CAST(('0x' || substring(md5(w), 9, 8)) AS BIGINT) % 2 = 0
        |       THEN 1 ELSE -1 END AS sign
        | FROM tok)
        |SELECT doc_id, bucket, CAST(sum(sign) AS BIGINT) AS feat
        |FROM h GROUP BY doc_id, bucket
        |HAVING CAST(sum(sign) AS BIGINT) <> 0
        |ORDER BY doc_id, bucket""".stripMargin,
    // q171: every datacard cell restated — token stats in plain SQL,
    // dup membership = distinct ids of the recursive pair set
    "q171_datacard" ->
      s"""WITH RECURSIVE pairs AS (${jaccardPairsSql("0.8")}),
         |d AS (
         | SELECT doc_id, lang, len(text) AS chars,
         |  len(string_split(lower(trim(text)), ' ')) AS toks
         | FROM documents),
         |dup AS (
         | SELECT DISTINCT id FROM (
         |  SELECT id_a AS id FROM pairs UNION SELECT id_b FROM pairs) u),
         |dl AS (
         | SELECT lang, count(*) AS dup_docs
         | FROM dup JOIN documents ON doc_id = id GROUP BY lang)
         |SELECT d.lang, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS n_tokens,
         | round(avg(chars), 2) AS avg_chars, round(median(toks), 1) AS median_tokens,
         | CAST(coalesce(dl.dup_docs, 0) AS BIGINT) AS dup_docs,
         | coalesce(dl.dup_docs, 0) * 1000000 // count(*) AS dup_ppm
         |FROM d LEFT JOIN dl ON d.lang = dl.lang
         |GROUP BY d.lang, dl.dup_docs
         |ORDER BY d.lang""".stripMargin,
    // q172: each relationship restated as a filtered count + NOT IN
    "q172_ref_integrity" ->
      """SELECT 'customer.c_nationkey->nation' AS fk, count(*) AS n_child,
        | count(*) FILTER (c_nationkey NOT IN (SELECT n_nationkey FROM nation)) AS n_orphans,
        | count(*) FILTER (c_nationkey NOT IN (SELECT n_nationkey FROM nation)) = 0 AS ok
        |FROM customer WHERE c_nationkey IS NOT NULL
        |UNION ALL
        |SELECT 'events.user_id->customer', count(*),
        | count(*) FILTER (user_id NOT IN (SELECT c_custkey FROM customer)),
        | count(*) FILTER (user_id NOT IN (SELECT c_custkey FROM customer)) = 0
        |FROM events WHERE user_id IS NOT NULL
        |UNION ALL
        |SELECT 'lineitem.l_orderkey->orders', count(*),
        | count(*) FILTER (l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
        | count(*) FILTER (l_orderkey NOT IN (SELECT o_orderkey FROM orders)) = 0
        |FROM lineitem WHERE l_orderkey IS NOT NULL
        |UNION ALL
        |SELECT 'orders.o_custkey->customer', count(*),
        | count(*) FILTER (o_custkey NOT IN (SELECT c_custkey FROM customer)),
        | count(*) FILTER (o_custkey NOT IN (SELECT c_custkey FROM customer)) = 0
        |FROM orders WHERE o_custkey IS NOT NULL
        |ORDER BY fk""".stripMargin,
    // q173: the erasure arithmetic restated; version 0 is deterministic
    // on the freshly-wiped root
    "q173_gdpr_erase" ->
      """WITH subj AS (SELECT c_custkey FROM customer WHERE c_custkey % 100 = 7)
        |SELECT 'customer' AS table_name,
        | (SELECT count(*) FROM customer) AS n_before,
        | (SELECT count(*) FROM customer WHERE c_custkey IN (SELECT c_custkey FROM subj)) AS n_erased,
        | (SELECT count(*) FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM subj)) AS n_after,
        | CAST(0 AS BIGINT) AS version
        |UNION ALL
        |SELECT 'orders',
        | (SELECT count(*) FROM orders),
        | (SELECT count(*) FROM orders WHERE o_custkey IN (SELECT c_custkey FROM subj)),
        | (SELECT count(*) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM subj)),
        | CAST(0 AS BIGINT)
        |ORDER BY table_name""".stripMargin,

    // q174/q175: containment restated from the same 2-gram inverted
    // index as the q44 oracle, both directional ratios per pair
    "q174_containment_pairs" ->
      s"""$containmentPairsSql
        |SELECT id_a, id_b, round(ca, 6) AS cont_a, round(cb, 6) AS cont_b,
        | round(shared * 1.0 / (na + nb - shared), 6) AS jaccard
        |FROM qual
        |ORDER BY id_a, id_b""".stripMargin,

    "q175_containment_dedup" ->
      s"""$containmentPairsSql,
        |drops AS (
        | SELECT DISTINCT CASE WHEN ca > cb THEN id_a
        |                      WHEN cb > ca THEN id_b
        |                      ELSE greatest(id_a, id_b) END AS doc_id
        | FROM qual)
        |SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM drops)
        |ORDER BY doc_id""".stripMargin,

    // q176: window-sum restatement of the leave-one-out target
    // statistic over exact integer cents (order-independent sums)
    "q176_target_encoding" ->
      """WITH o AS (
        | SELECT o_orderkey, o_orderpriority,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        | FROM orders)
        |SELECT o_orderkey, o_orderpriority,
        | round((CASE WHEN count(*) OVER (PARTITION BY o_orderpriority) > 1
        |   THEN (sum(cents) OVER (PARTITION BY o_orderpriority) - cents) * 1.0
        |        / (count(*) OVER (PARTITION BY o_orderpriority) - 1)
        |   ELSE (sum(cents) OVER () - cents) * 1.0 / (count(*) OVER () - 1)
        |  END) / 100.0, 6) AS loo_enc
        |FROM o
        |ORDER BY o_orderkey""".stripMargin,

    "q177_quantile_bins" ->
      """WITH b AS (
        | SELECT quantile_cont(o_totalprice,
        |   [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS bps
        | FROM orders),
        |binned AS (
        | SELECT o_totalprice AS v,
        |  1 + len(list_filter((SELECT bps FROM b), bp -> o_totalprice > bp)) AS bin
        | FROM orders)
        |SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n,
        | round(min(v), 2) AS min_price, round(max(v), 2) AS max_price
        |FROM binned GROUP BY bin ORDER BY bin""".stripMargin,

    "q178_mutual_info" ->
      """WITH cells AS (
        | SELECT o_orderpriority AS x, o_orderstatus AS y, count(*) AS nxy
        | FROM orders GROUP BY 1, 2),
        |mx AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx FROM cells GROUP BY 1),
        |my AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM cells)
        |SELECT max(tot.n) AS n, count(*) AS n_cells,
        | round(sum((nxy / tot.n) * ln((nxy * tot.n) / (nx * ny))), 6) AS mi
        |FROM cells JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot""".stripMargin,

    "q179_benford_audit" ->
      """WITH d AS (
        | SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        | FROM orders WHERE o_totalprice >= 1),
        |c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
        |SELECT digit, n,
        | round(n / total, 6) AS observed_p,
        | round(log10(1 + 1.0 / digit), 6) AS expected_p,
        | round(pow(n / total - log10(1 + 1.0 / digit), 2) / log10(1 + 1.0 / digit) * total, 6) AS chi2_term
        |FROM c CROSS JOIN t ORDER BY digit""".stripMargin,

    // q180: the pooled two-proportion z restated with the engine's
    // exact operation order so every double is bit-identical
    "q180_ab_test" ->
      """WITH units AS (
        | SELECT user_id, CAST(ts AS DATE) AS day, user_id % 2 AS v,
        |  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        | FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2, 3),
        |bv AS (SELECT v, count(*) AS n, CAST(sum(conv) AS BIGINT) AS c
        |       FROM units GROUP BY 1),
        |a AS (SELECT n, c FROM bv WHERE v = (SELECT min(v) FROM bv)),
        |b AS (SELECT n, c FROM bv WHERE v = (SELECT max(v) FROM bv)),
        |z AS (SELECT
        |  (a.c / a.n - b.c / b.n) /
        |  sqrt(((a.c + b.c) / (a.n + b.n)) * (1 - (a.c + b.c) / (a.n + b.n))
        |       * (1.0 / a.n + 1.0 / b.n)) AS zval,
        |  a.n AS n_a, b.n AS n_b, a.c AS conv_a, b.c AS conv_b
        | FROM a CROSS JOIN b)
        |SELECT (SELECT min(v) FROM bv) AS variant_a,
        | (SELECT max(v) FROM bv) AS variant_b,
        | n_a, n_b, conv_a, conv_b,
        | round(conv_a / n_a, 6) AS p_a, round(conv_b / n_b, 6) AS p_b,
        | round(zval, 6) AS z,
        | abs(zval) > 1.959963984540054 AS significant
        |FROM z""".stripMargin,

    "q181_chao1" ->
      """WITH tf AS (
        | SELECT tok AS token, count(*) AS freq
        | FROM (SELECT unnest(list_filter(string_split(lower(trim(text)), ' '),
        |                     t -> t <> '')) AS tok FROM documents)
        | GROUP BY 1)
        |SELECT CAST(sum(freq) AS BIGINT) AS n_tokens, count(*) AS vocab,
        | CAST(sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        | CAST(sum(CASE WHEN freq = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
        | round(count(*) +
        |  (sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END) * (sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END) - 1))
        |   / (2.0 * (sum(CASE WHEN freq = 2 THEN 1 ELSE 0 END) + 1)), 6) AS chao1
        |FROM tf""".stripMargin,

    "q182_zipf_slope" ->
      """WITH tf AS (
        | SELECT tok AS token, count(*) AS freq
        | FROM (SELECT unnest(list_filter(string_split(lower(trim(text)), ' '),
        |                     t -> t <> '')) AS tok FROM documents)
        | GROUP BY 1),
        |top AS (SELECT token, freq FROM tf ORDER BY freq DESC, token ASC LIMIT 100),
        |r AS (SELECT ln(row_number() OVER (ORDER BY freq DESC, token ASC)) AS x,
        |             ln(freq) AS y FROM top),
        |s AS (SELECT count(*) AS n_ranks, sum(x) AS sx, sum(y) AS sy,
        |             sum(x * y) AS sxy, sum(x * x) AS sxx FROM r)
        |SELECT n_ranks,
        | round((n_ranks * sxy - sx * sy) / (n_ranks * sxx - sx * sx), 6) AS slope,
        | round((sy - ((n_ranks * sxy - sx * sy) / (n_ranks * sxx - sx * sx)) * sx)
        |       / n_ranks, 6) AS intercept
        |FROM s""".stripMargin,

    "q183_gini_sources" ->
      """WITH sz AS (SELECT source, count(*) AS x FROM documents GROUP BY 1),
        |r AS (SELECT x, row_number() OVER (ORDER BY x ASC, source ASC) AS i FROM sz),
        |s AS (SELECT count(*) AS n_groups, CAST(sum(x) AS BIGINT) AS total,
        |             CAST(sum(i * x) AS BIGINT) AS ix FROM r)
        |SELECT n_groups, total,
        | round(2.0 * ix / (n_groups * total)
        |       - (n_groups + 1) / CAST(n_groups AS DOUBLE), 6) AS gini
        |FROM s""".stripMargin,

    // q184: the md5 CDF-ladder Poisson draws replayed verbatim —
    // weights, exact integer replicate sums, both percentiles
    "q184_bootstrap_ci" ->
      """WITH o AS (SELECT o_orderkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        |reps AS (SELECT b FROM generate_series(1, 200) t(b)),
        |w AS (SELECT cents, b,
        |  (CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR) || '|' || CAST((b - 1) // 4 AS VARCHAR)),
        |                           1 + 8 * ((b - 1) % 4), 8)) AS BIGINT) + 0.5)
        |    / 4294967296.0 AS u
        | FROM o CROSS JOIN reps),
        |wt AS (SELECT b, cents,
        |  CASE WHEN u < 0.36787944117144233 THEN 0
        |       WHEN u < 0.7357588823428847 THEN 1
        |       WHEN u < 0.9196986029286058 THEN 2
        |       WHEN u < 0.9810118431238462 THEN 3
        |       WHEN u < 0.9963401531726563 THEN 4
        |       WHEN u < 0.9994058151824183 THEN 5
        |       WHEN u < 0.9999167588507119 THEN 6
        |       ELSE 7 END AS wgt
        | FROM w),
        |m AS (SELECT b, sum(wgt * cents) * 1.0 / sum(wgt) AS mean_b
        |      FROM wt GROUP BY 1),
        |p AS (SELECT count(*) AS n_replicates,
        |             quantile_cont(mean_b, 0.025) AS lo,
        |             quantile_cont(mean_b, 0.975) AS hi FROM m),
        |pt AS (SELECT count(*) AS n, avg(cents) AS pm FROM o)
        |SELECT n, round(pm / 100.0, 6) AS point_mean, n_replicates,
        | round(lo / 100.0, 6) AS ci_lo, round(hi / 100.0, 6) AS ci_hi
        |FROM p CROSS JOIN pt""".stripMargin,

    "q185_cohens_kappa" ->
      """WITH l AS (SELECT o_orderstatus AS a,
        |  CASE WHEN o_orderkey % 10 = 0 THEN 'O' ELSE o_orderstatus END AS b
        | FROM orders),
        |cells AS (SELECT a, b, count(*) AS nab FROM l GROUP BY 1, 2),
        |ma AS (SELECT a, CAST(sum(nab) AS BIGINT) AS na FROM cells GROUP BY 1),
        |mb AS (SELECT b, CAST(sum(nab) AS BIGINT) AS nb FROM cells GROUP BY 1),
        |ag AS (SELECT CAST(sum(nab) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN a = b THEN nab ELSE 0 END) AS BIGINT) AS agree
        | FROM cells),
        |pe AS (SELECT CAST(sum(na * nb) AS BIGINT) AS ee
        |       FROM ma JOIN mb ON ma.a = mb.b)
        |SELECT n, round(agree * 1.0 / n, 6) AS po,
        | round(ee * 1.0 / (n * n), 6) AS pe,
        | round((agree * 1.0 / n - ee * 1.0 / (n * n))
        |       / (1 - ee * 1.0 / (n * n)), 6) AS kappa
        |FROM ag CROSS JOIN pe""".stripMargin,

    // q186: the A-Res order statistic replayed — md5 uniform, ln(u)/w
    // key quantized to 10 dp, top-50, ties by id
    "q186_weighted_topk" ->
      """SELECT doc_id, lang, n_chars FROM (
        | SELECT doc_id, lang, n_chars,
        |  round(ln((CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
        |           / 4294967296.0) / n_chars, 10) AS k
        | FROM documents WHERE n_chars > 0
        | ORDER BY k DESC, doc_id ASC LIMIT 50)
        |ORDER BY doc_id""".stripMargin,

    "q187_trend_slopes" ->
      """WITH e AS (
        | SELECT event_type,
        |  datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
        |  value AS y
        | FROM events WHERE value IS NOT NULL),
        |s AS (SELECT event_type, count(*) AS n,
        |  sum(CAST(x AS DOUBLE)) AS sx, sum(y) AS sy,
        |  sum(CAST(x AS DOUBLE) * y) AS sxy,
        |  sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS sxx
        | FROM e GROUP BY 1)
        |SELECT event_type, n,
        | round(CASE WHEN n >= 2 AND n * sxx - sx * sx <> 0
        |   THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 6) AS slope,
        | round(CASE WHEN n >= 2 AND n * sxx - sx * sx <> 0
        |   THEN (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
        |  END, 6) AS intercept
        |FROM s ORDER BY event_type""".stripMargin,

    "q188_mmr_diversify" -> mmrOracle,

    // q189: content equality across the JSONL export/import edge,
    // pinned by aggregating the original parquet
    "q189_jsonl_roundtrip" ->
      """SELECT lang, source, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        | min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q190: the deterministic Laplace draw replayed — md5 uniform,
    // inverse CDF, the engine's exact operation order
    "q190_dp_counts" ->
      """WITH g AS (SELECT o_orderpriority, o_orderstatus, count(*) AS n
        |           FROM orders GROUP BY 1, 2),
        |w AS (SELECT o_orderpriority, o_orderstatus, n,
        | (CAST(('0x' || substring(md5(coalesce(CAST(o_orderpriority AS VARCHAR), ' null')
        |    || '|' || coalesce(CAST(o_orderstatus AS VARCHAR), ' null') || '|' || 'dp'), 1, 8)) AS BIGINT) + 0.5)
        |   / 4294967296.0 AS u
        | FROM g)
        |SELECT o_orderpriority, o_orderstatus,
        | round(n + ((-CAST(1.0 AS DOUBLE))
        |   * (CASE WHEN u > 0.5 THEN 1.0 WHEN u < 0.5 THEN -1.0 ELSE 0.0 END)
        |   * ln(1.0 - 2.0 * abs(u - 0.5))), 6) AS noised_count,
        | CAST(1.0 AS DOUBLE) AS epsilon
        |FROM w ORDER BY o_orderpriority, o_orderstatus""".stripMargin,

    // q191: the incremental-join identity checked against the full
    // join filtered to delta-touching pairs
    "q191_delta_join" ->
      """SELECT o_orderkey, o_custkey AS custkey, c_nationkey
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE (o.o_orderkey % 20 = 0) OR (c.c_custkey % 25 = 0)
        |ORDER BY o_orderkey""".stripMargin,

    // q192: RBO terms per depth — a common doc enters every prefix
    // depth >= max(rank_a, rank_b)
    "q192_rbo" ->
      """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
        |vec AS (SELECT qid, did, rank FROM (
        | SELECT q.vec_id AS qid, c.vec_id AS did,
        |  row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
        |             c.vec_id ASC) AS rank
        | FROM q JOIN embeddings c ON q.vec_id <> c.vec_id) t WHERE rank <= 10),
        |dt AS (SELECT doc_id,
        |  unnest(list_distinct(list_filter(string_split(lower(trim(text)), ' '),
        |    x -> x <> ''))) AS token FROM documents),
        |lexov AS (SELECT a.doc_id AS qid, b.doc_id AS did, count(*) AS ov
        | FROM dt a JOIN dt b ON a.token = b.token
        |  AND a.doc_id < 5 AND b.doc_id <> a.doc_id
        | GROUP BY 1, 2),
        |lex AS (SELECT qid, did, rank FROM (
        | SELECT qid, did, row_number() OVER (PARTITION BY qid
        |   ORDER BY ov DESC, did ASC) AS rank FROM lexov) t WHERE rank <= 10),
        |common AS (SELECT v.qid, v.did, greatest(v.rank, l.rank) AS mx
        | FROM vec v JOIN lex l ON v.qid = l.qid AND v.did = l.did),
        |depths AS (SELECT qid, unnest(range(mx, 11)) AS depth FROM common),
        |terms AS (SELECT qid, depth, count(*) AS ov FROM depths GROUP BY 1, 2),
        |rbo AS (SELECT qid,
        |  sum((1 - CAST(0.9 AS DOUBLE)) * pow(CAST(0.9 AS DOUBLE), depth - 1)
        |      * ov / depth) AS r
        | FROM terms GROUP BY 1),
        |uq AS (SELECT DISTINCT qid FROM vec UNION SELECT DISTINCT qid FROM lex)
        |SELECT uq.qid AS query_id, round(coalesce(r, 0.0), 6) AS rbo
        |FROM uq LEFT JOIN rbo ON uq.qid = rbo.qid
        |ORDER BY query_id""".stripMargin,

    "q193_mad_outliers" ->
      """WITH e AS (SELECT event_type, event_id, value FROM events
        |           WHERE value IS NOT NULL),
        |med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |        FROM e GROUP BY 1),
        |d AS (SELECT e.event_type, event_id, value, med, abs(value - med) AS dev
        |      FROM e JOIN med USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
        |        FROM d GROUP BY 1)
        |SELECT d.event_type, event_id, round(value, 6) AS value,
        | round(med, 6) AS med, round(mad, 6) AS mad,
        | round(CASE WHEN mad > 0 THEN dev / mad END, 6) AS robust_z
        |FROM d JOIN mad USING (event_type)
        |WHERE dev > 5.0 * mad
        |ORDER BY event_type, event_id""".stripMargin,

    "q194_rfm_features" ->
      """WITH base AS (SELECT o_custkey,
        |  CAST(datediff('day', CAST(max(o_orderdate) AS DATE), DATE '1998-08-02') AS BIGINT) AS recency_days,
        |  count(*) AS frequency,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS monetary
        | FROM orders GROUP BY 1),
        |rb AS (SELECT quantile_cont(CAST(recency_days AS DOUBLE), [0.2, 0.4, 0.6, 0.8]) AS bps FROM base),
        |fb AS (SELECT quantile_cont(CAST(frequency AS DOUBLE), [0.2, 0.4, 0.6, 0.8]) AS bps FROM base),
        |mb AS (SELECT quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS bps FROM base)
        |SELECT o_custkey, recency_days, frequency, round(monetary, 2) AS monetary,
        | CAST(6 - (1 + len(list_filter((SELECT bps FROM rb), bp -> recency_days > bp))) AS BIGINT) AS r_score,
        | CAST(1 + len(list_filter((SELECT bps FROM fb), bp -> frequency > bp)) AS BIGINT) AS f_score,
        | CAST(1 + len(list_filter((SELECT bps FROM mb), bp -> monetary > bp)) AS BIGINT) AS m_score
        |FROM base ORDER BY o_custkey""".stripMargin,

    // q195: the round-trip identity IS the oracle — codeTokens must
    // invert camelCasing exactly, so the joined-token md5 pins every
    // boundary rule
    "q195_code_tokens" ->
      """WITH a AS (SELECT doc_id,
        |  list_filter(string_split(lower(trim(text)), ' '),
        |    t -> regexp_full_match(t, '[a-z]{2,}')) AS alpha
        | FROM documents)
        |SELECT doc_id,
        | CAST(len(alpha) AS BIGINT) AS n_alpha,
        | CAST(len(alpha) AS BIGINT) AS n_recovered,
        | true AS ok,
        | md5(array_to_string(alpha, ' ')) AS toks_md5
        |FROM a ORDER BY doc_id""".stripMargin,

    "q196_semantic_decontam" ->
      """WITH ev AS (SELECT vec_id AS eval_id, embedding FROM embeddings WHERE vec_id < 20),
        |tr AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 20),
        |s AS (SELECT t.vec_id, ev.eval_id,
        |  list_cosine_similarity(t.embedding::DOUBLE[], ev.embedding::DOUBLE[]) AS c,
        |  row_number() OVER (PARTITION BY t.vec_id
        |    ORDER BY list_cosine_similarity(t.embedding::DOUBLE[], ev.embedding::DOUBLE[]) DESC,
        |             ev.eval_id ASC) AS rn
        | FROM tr t JOIN ev ON t.vec_id <> ev.eval_id)
        |SELECT vec_id, eval_id, round(c, 6) AS cosine
        |FROM s WHERE rn = 1 AND c >= 0.35
        |ORDER BY vec_id""".stripMargin,

    // q197: the full winnowing pipeline replayed — md5-prefix gram
    // hashes, w-window minima, distinct fingerprint sets, pair counts
    "q197_winnowed_pairs" ->
      """WITH t0 AS (SELECT doc_id, lang, string_split(lower(trim(text)), ' ') AS toks
        |            FROM documents),
        |t1 AS (SELECT doc_id, lang,
        |  list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
        |    i -> CAST(('0x' || substring(md5(array_to_string(toks[i+1 : i+3], ' ')), 1, 8)) AS BIGINT)) AS grams
        | FROM t0),
        |g AS (SELECT doc_id, lang,
        |  list_distinct(list_transform(range(0, greatest(len(grams) - 4, 0) + 1),
        |    j -> list_min(grams[j+1 : j+4]))) AS fps
        | FROM t1),
        |fp AS (SELECT doc_id, lang, unnest(fps) AS fp FROM g)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_fps
        |FROM fp a JOIN fp b ON a.fp = b.fp AND a.lang = b.lang AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY id_a, id_b""".stripMargin,

    // q198: BLEU replayed in full — adjacent-pair lead window, per-order
    // gram lists, clipped counts via least(cand, ref) per distinct gram,
    // Lin-Och add-one smoothing for n >= 2, BP, geometric mean (same
    // IEEE op order as the engine: each log term divided by 4, summed
    // left to right)
    "q198_bleu" -> (bleuPairOracle + "\nORDER BY cand_id"),

    // q199: ROUGE-1/2 over the same pair harness and clipped-count CTEs
    // — one row per (pair, n); f1 from the UNROUNDED precision/recall,
    // matching the engine
    "q199_rouge" ->
      s"""WITH $ngramClipCtes,
        |j AS (
        | SELECT t.cand_id, t.n, COALESCE(cl.clipped, 0) AS ov, t.c_tot, t.r_tot,
        |  CASE WHEN t.c_tot = 0 THEN 0.0
        |       ELSE CAST(COALESCE(cl.clipped, 0) AS DOUBLE) / t.c_tot END AS prec,
        |  CASE WHEN t.r_tot = 0 THEN 0.0
        |       ELSE CAST(COALESCE(cl.clipped, 0) AS DOUBLE) / t.r_tot END AS rec
        | FROM tot t LEFT JOIN cl ON t.cand_id = cl.cand_id AND t.n = cl.n
        | WHERE t.n <= 2)
        |SELECT j.cand_id, pp.ref_id, CAST(j.n AS INTEGER) AS n,
        | CAST(j.ov AS BIGINT) AS overlap,
        | CAST(j.c_tot AS BIGINT) AS cand_total, CAST(j.r_tot AS BIGINT) AS ref_total,
        | round(j.prec, 6) AS "precision",
        | round(j.rec, 6) AS recall,
        | round(CASE WHEN j.prec + j.rec = 0.0 THEN 0.0
        |   ELSE 2.0 * j.prec * j.rec / (j.prec + j.rec) END, 6) AS f1
        |FROM j JOIN pp ON j.cand_id = pp.cand_id
        |ORDER BY j.cand_id, j.n""".stripMargin,

    // q200: micro-averaged corpus BLEU — exact long sums per source,
    // then the same smoothing/BP/geomean IEEE op order as the engine
    "q200_corpus_bleu" ->
      s"""WITH $ngramClipCtes,
        |per AS (
        | SELECT pp.source, t.cand_id, t.n, t.c_tot, t.r_tot,
        |  COALESCE(cl.clipped, 0) AS m
        | FROM tot t
        | LEFT JOIN cl ON t.cand_id = cl.cand_id AND t.n = cl.n
        | JOIN pp ON t.cand_id = pp.cand_id),
        |ag AS (
        | SELECT source,
        |  CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
        |  CAST(sum(CASE WHEN n = 1 THEN c_tot END) AS BIGINT) AS c_len,
        |  CAST(sum(CASE WHEN n = 1 THEN r_tot END) AS BIGINT) AS r_len,
        |  CAST(sum(CASE WHEN n = 1 THEN m END) AS BIGINT) AS m1,
        |  CAST(sum(CASE WHEN n = 2 THEN m END) AS BIGINT) AS m2,
        |  CAST(sum(CASE WHEN n = 3 THEN m END) AS BIGINT) AS m3,
        |  CAST(sum(CASE WHEN n = 4 THEN m END) AS BIGINT) AS m4,
        |  CAST(sum(CASE WHEN n = 2 THEN c_tot END) AS BIGINT) AS ct2,
        |  CAST(sum(CASE WHEN n = 3 THEN c_tot END) AS BIGINT) AS ct3,
        |  CAST(sum(CASE WHEN n = 4 THEN c_tot END) AS BIGINT) AS ct4
        | FROM per GROUP BY source),
        |f AS (
        | SELECT *, CASE WHEN c_len = 0 THEN 0.0
        |   WHEN c_len > r_len THEN 1.0
        |   ELSE exp(1.0 - CAST(r_len AS DOUBLE) / c_len) END AS bp
        | FROM ag)
        |SELECT source, n_pairs, c_len, r_len, m1, m2, m3, m4,
        | round(bp, 6) AS bp,
        | round(CASE WHEN c_len = 0 OR m1 = 0 THEN 0.0
        |   ELSE bp * exp(ln(CAST(m1 AS DOUBLE) / c_len) / 4
        |               + ln(CAST(m2 + 1 AS DOUBLE) / (ct2 + 1)) / 4
        |               + ln(CAST(m3 + 1 AS DOUBLE) / (ct3 + 1)) / 4
        |               + ln(CAST(m4 + 1 AS DOUBLE) / (ct4 + 1)) / 4) END, 6) AS corpus_bleu
        |FROM f ORDER BY source""".stripMargin,

    // q201: per-pair BLEU replayed (the q198 pipeline), then the mean
    // over integer BLEU-micros — exact, order-independent
    "q201_self_bleu" ->
      s"""WITH $ngramClipCtes,
        |m AS (
        | SELECT t.cand_id,
        |  max(CASE WHEN t.n = 1 THEN t.c_tot END) AS c_len,
        |  max(CASE WHEN t.n = 1 THEN t.r_tot END) AS r_len,
        |  max(CASE WHEN t.n = 1 THEN COALESCE(cl.clipped, 0) END) AS m1,
        |  max(CASE WHEN t.n = 2 THEN COALESCE(cl.clipped, 0) END) AS m2,
        |  max(CASE WHEN t.n = 3 THEN COALESCE(cl.clipped, 0) END) AS m3,
        |  max(CASE WHEN t.n = 4 THEN COALESCE(cl.clipped, 0) END) AS m4,
        |  max(CASE WHEN t.n = 2 THEN t.c_tot END) AS ct2,
        |  max(CASE WHEN t.n = 3 THEN t.c_tot END) AS ct3,
        |  max(CASE WHEN t.n = 4 THEN t.c_tot END) AS ct4
        | FROM tot t LEFT JOIN cl ON t.cand_id = cl.cand_id AND t.n = cl.n
        | GROUP BY 1),
        |f AS (
        | SELECT pp.source, m.*,
        |  CASE WHEN m.c_len = 0 THEN 0.0
        |       WHEN m.c_len > m.r_len THEN 1.0
        |       ELSE exp(1.0 - CAST(m.r_len AS DOUBLE) / m.c_len) END AS bp
        | FROM m JOIN pp ON m.cand_id = pp.cand_id),
        |b AS (
        | SELECT source,
        |  round(CASE WHEN c_len = 0 OR m1 = 0 THEN 0.0
        |    ELSE bp * exp(ln(CAST(m1 AS DOUBLE) / c_len) / 4
        |                + ln(CAST(m2 + 1 AS DOUBLE) / (ct2 + 1)) / 4
        |                + ln(CAST(m3 + 1 AS DOUBLE) / (ct3 + 1)) / 4
        |                + ln(CAST(m4 + 1 AS DOUBLE) / (ct4 + 1)) / 4) END, 6) AS bleu
        | FROM f)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_pairs,
        | round(CAST(sum(CAST(round(bleu * 1000000) AS BIGINT)) AS DOUBLE)
        |   / (CAST(count(*) AS DOUBLE) * 1000000.0), 6) AS self_bleu
        |FROM b GROUP BY source ORDER BY source""".stripMargin,

    // q205: chrF2 replayed — char tokens (whitespace stripped), per-order
    // clipped counts for n=1..6, all-orders macro-average, beta=2 F
    "q205_chrf" -> (chrfPairOracle + "\nORDER BY m.cand_id"),

    // q206: the LCS dynamic program replayed as a recursive CTE over
    // anti-diagonals (diagonal d needs only d-1 and d-2, so each step
    // is one list_transform; dp[n][m] is the single entry of the last
    // diagonal), then Lin's F arithmetic in the engine's IEEE op order
    "q206_rouge_l" -> (rougeLPairOracle + "\nORDER BY cand_id"),

    // q207: the edit-distance DP replayed — q206's anti-diagonal
    // recursion with min/+1 costs and i/j base rows
    "q207_wer" -> (werPairOracle + "\nORDER BY cand_id"),

    // q208: the four per-pair metric oracles wrapped as CTEs, joined on
    // cand_id, integer-micro means per source — one replayed datacard
    "q208_eval_rollup" ->
      s"""WITH b AS ($bleuPairOracle),
        |c AS ($chrfPairOracle),
        |rl AS ($rougeLPairOracle),
        |w AS ($werPairOracle),
        |src AS (SELECT doc_id AS cand_id, source FROM documents)
        |SELECT src.source, CAST(count(*) AS BIGINT) AS n_pairs,
        | round(CAST(sum(CAST(round(b.bleu * 1000000) AS BIGINT)) AS DOUBLE)
        |   / (CAST(count(*) AS DOUBLE) * 1000000.0), 6) AS bleu_mean,
        | round(CAST(sum(CAST(round(c.chrf * 1000000) AS BIGINT)) AS DOUBLE)
        |   / (CAST(count(*) AS DOUBLE) * 1000000.0), 6) AS chrf_mean,
        | round(CAST(sum(CAST(round(rl.rouge_l * 1000000) AS BIGINT)) AS DOUBLE)
        |   / (CAST(count(*) AS DOUBLE) * 1000000.0), 6) AS rouge_l_mean,
        | round(CAST(sum(CAST(round(w.wer * 1000000) AS BIGINT)) AS DOUBLE)
        |   / (CAST(count(*) AS DOUBLE) * 1000000.0), 6) AS wer_mean
        |FROM b
        | JOIN c USING (cand_id) JOIN rl USING (cand_id)
        | JOIN w USING (cand_id) JOIN src USING (cand_id)
        |GROUP BY src.source ORDER BY src.source""".stripMargin,

    // q202: PNG is lossless -> the q163 closed-form bit reconstruction
    // applies verbatim to the ImageIO-decoded PNG corpus
    "q202_png_dhash" -> dhashClosedFormOracle,

    // q203: the verdict column is the oracle (q152 convention) — JPEG
    // codec output is not SQL-expressible; the engine must earn TRUE
    // for every image by actually decoding and hashing both payloads
    "q203_jpeg_dhash_stability" ->
      """SELECT r.i AS media_id, TRUE AS within_16_bits
        |FROM range(300) r(i) WHERE r.i % 3 = 0
        |ORDER BY media_id""".stripMargin,

    // q204: q134's closed-form cell means, decoded from PNG
    "q204_png_pool" -> poolClosedFormOracle,

    // q209: the oracle corpus is pure single-space ASCII, so the
    // UAX#29 tokenizer must equal the whitespace tokenizer EXACTLY —
    // count + joined md5 replayed; the engine-side array-equality
    // verdict restated as TRUE (q195 round-trip convention); character
    // conservation via md5 of the space-stripped text
    "q209_unicode_tokens" ->
      """WITH a AS (SELECT doc_id,
        |  list_filter(string_split(lower(trim(text)), ' '), t -> t <> '') AS toks,
        |  text FROM documents)
        |SELECT doc_id,
        | CAST(len(toks) AS BIGINT) AS n_tokens,
        | md5(array_to_string(toks, ' ')) AS toks_md5,
        | true AS ws_equal,
        | md5(replace(trim(text), ' ', '')) AS chars_md5
        |FROM a ORDER BY doc_id""".stripMargin,

    // q211: multi-ref BLEU replayed in full — two-lead pair harness,
    // per-ref gram counts MAX-merged per gram before clipping,
    // closest-length (ties shorter) effective reference for BP, then
    // the q198 smoothing/BP/geomean arithmetic
    "q211_bleu_multi" ->
      s"""WITH $multiRefPairCtes,
        |ns AS (SELECT unnest([1, 2, 3, 4]) AS n),
        |eff AS (
        | SELECT cand_id, len(ct) AS c_len,
        |  CASE WHEN abs(len(r1) - len(ct)) < abs(len(r2) - len(ct)) THEN len(r1)
        |       WHEN abs(len(r2) - len(ct)) < abs(len(r1) - len(ct)) THEN len(r2)
        |       ELSE least(len(r1), len(r2)) END AS eff_len
        | FROM pp),
        |tot AS (
        | SELECT e.cand_id, n, greatest(e.c_len - n + 1, 0) AS c_tot,
        |  greatest(e.eff_len - n + 1, 0) AS r_tot
        | FROM eff e, ns),
        |cg AS (
        | SELECT cand_id, n, g, count(*) AS cc FROM (
        |  SELECT cand_id, n, unnest(list_transform(range(greatest(len(ct) - n + 1, 0)),
        |   i -> array_to_string(ct[i+1 : i+n], ' '))) AS g
        |  FROM pp, ns)
        | GROUP BY 1, 2, 3),
        |rg AS (
        | SELECT cand_id, n, g, max(rc) AS rc FROM (
        |  SELECT cand_id, n, g, count(*) AS rc FROM (
        |   SELECT cand_id, n, unnest(list_transform(range(greatest(len(r1) - n + 1, 0)),
        |    i -> array_to_string(r1[i+1 : i+n], ' '))) AS g
        |   FROM pp, ns)
        |  GROUP BY 1, 2, 3
        |  UNION ALL
        |  SELECT cand_id, n, g, count(*) AS rc FROM (
        |   SELECT cand_id, n, unnest(list_transform(range(greatest(len(r2) - n + 1, 0)),
        |    i -> array_to_string(r2[i+1 : i+n], ' '))) AS g
        |   FROM pp, ns)
        |  GROUP BY 1, 2, 3)
        | GROUP BY 1, 2, 3),
        |cl AS (
        | SELECT cand_id, n, COALESCE(sum(least(cc, COALESCE(rc, 0))), 0) AS clipped
        | FROM cg LEFT JOIN rg USING (cand_id, n, g)
        | GROUP BY 1, 2),
        |m AS (
        | SELECT t.cand_id,
        |  max(CASE WHEN t.n = 1 THEN t.c_tot END) AS c_len,
        |  max(CASE WHEN t.n = 1 THEN t.r_tot END) AS r_len,
        |  max(CASE WHEN t.n = 1 THEN COALESCE(cl.clipped, 0) END) AS m1,
        |  max(CASE WHEN t.n = 2 THEN COALESCE(cl.clipped, 0) END) AS m2,
        |  max(CASE WHEN t.n = 3 THEN COALESCE(cl.clipped, 0) END) AS m3,
        |  max(CASE WHEN t.n = 4 THEN COALESCE(cl.clipped, 0) END) AS m4,
        |  max(CASE WHEN t.n = 2 THEN t.c_tot END) AS ct2,
        |  max(CASE WHEN t.n = 3 THEN t.c_tot END) AS ct3,
        |  max(CASE WHEN t.n = 4 THEN t.c_tot END) AS ct4
        | FROM tot t LEFT JOIN cl ON t.cand_id = cl.cand_id AND t.n = cl.n
        | GROUP BY 1),
        |f AS (
        | SELECT m.*,
        |  CASE WHEN m.c_len = 0 THEN 0.0
        |       WHEN m.c_len > m.r_len THEN 1.0
        |       ELSE exp(1.0 - CAST(m.r_len AS DOUBLE) / m.c_len) END AS bp
        | FROM m)
        |SELECT cand_id,
        | CAST(c_len AS BIGINT) AS c_len, CAST(r_len AS BIGINT) AS r_len,
        | CAST(m1 AS BIGINT) AS m1, CAST(m2 AS BIGINT) AS m2,
        | CAST(m3 AS BIGINT) AS m3, CAST(m4 AS BIGINT) AS m4,
        | round(bp, 6) AS bp,
        | round(CASE WHEN c_len = 0 OR m1 = 0 THEN 0.0
        |   ELSE bp * exp(ln(CAST(m1 AS DOUBLE) / c_len) / 4
        |               + ln(CAST(m2 + 1 AS DOUBLE) / (ct2 + 1)) / 4
        |               + ln(CAST(m3 + 1 AS DOUBLE) / (ct3 + 1)) / 4
        |               + ln(CAST(m4 + 1 AS DOUBLE) / (ct4 + 1)) / 4) END, 6) AS bleu
        |FROM f ORDER BY cand_id""".stripMargin,

    // q212: both per-reference ROUGE score sets replayed, the winner
    // picked by a (f1 DESC, ref_idx ASC) window — Lin's max-over-refs
    "q212_rouge_multi" ->
      s"""WITH $multiRefPairCtes,
        |ns AS (SELECT unnest([1, 2]) AS n),
        |cg AS (
        | SELECT cand_id, n, g, count(*) AS cc FROM (
        |  SELECT cand_id, n, unnest(list_transform(range(greatest(len(ct) - n + 1, 0)),
        |   i -> array_to_string(ct[i+1 : i+n], ' '))) AS g
        |  FROM pp, ns)
        | GROUP BY 1, 2, 3),
        |r1g AS (
        | SELECT cand_id, n, g, count(*) AS rc FROM (
        |  SELECT cand_id, n, unnest(list_transform(range(greatest(len(r1) - n + 1, 0)),
        |   i -> array_to_string(r1[i+1 : i+n], ' '))) AS g
        |  FROM pp, ns)
        | GROUP BY 1, 2, 3),
        |r2g AS (
        | SELECT cand_id, n, g, count(*) AS rc FROM (
        |  SELECT cand_id, n, unnest(list_transform(range(greatest(len(r2) - n + 1, 0)),
        |   i -> array_to_string(r2[i+1 : i+n], ' '))) AS g
        |  FROM pp, ns)
        | GROUP BY 1, 2, 3),
        |s AS (
        | SELECT cand_id, n, 0 AS ref_idx,
        |  greatest(len(ct) - n + 1, 0) AS c_tot,
        |  greatest(len(r1) - n + 1, 0) AS r_tot
        | FROM pp, ns
        | UNION ALL
        | SELECT cand_id, n, 1,
        |  greatest(len(ct) - n + 1, 0), greatest(len(r2) - n + 1, 0)
        | FROM pp, ns),
        |clp AS (
        | SELECT cand_id, n, 0 AS ref_idx, sum(least(cc, rc)) AS ov
        | FROM cg JOIN r1g USING (cand_id, n, g) GROUP BY 1, 2
        | UNION ALL
        | SELECT cand_id, n, 1, sum(least(cc, rc))
        | FROM cg JOIN r2g USING (cand_id, n, g) GROUP BY 1, 2),
        |j AS (
        | SELECT s.cand_id, s.n, s.ref_idx, COALESCE(clp.ov, 0) AS ov,
        |  s.c_tot, s.r_tot,
        |  CASE WHEN s.c_tot = 0 THEN 0.0
        |       ELSE CAST(COALESCE(clp.ov, 0) AS DOUBLE) / s.c_tot END AS prec,
        |  CASE WHEN s.r_tot = 0 THEN 0.0
        |       ELSE CAST(COALESCE(clp.ov, 0) AS DOUBLE) / s.r_tot END AS rec
        | FROM s LEFT JOIN clp
        |  ON s.cand_id = clp.cand_id AND s.n = clp.n AND s.ref_idx = clp.ref_idx),
        |jf AS (
        | SELECT j.*,
        |  CASE WHEN prec + rec = 0.0 THEN 0.0
        |       ELSE 2.0 * prec * rec / (prec + rec) END AS f1,
        |  row_number() OVER (PARTITION BY cand_id, n
        |   ORDER BY (CASE WHEN prec + rec = 0.0 THEN 0.0
        |             ELSE 2.0 * prec * rec / (prec + rec) END) DESC,
        |    ref_idx ASC) AS rn
        | FROM j)
        |SELECT cand_id, CAST(n AS INTEGER) AS n, CAST(ref_idx AS INTEGER) AS ref_idx,
        | CAST(ov AS BIGINT) AS overlap,
        | CAST(c_tot AS BIGINT) AS cand_total, CAST(r_tot AS BIGINT) AS ref_total,
        | round(prec, 6) AS "precision", round(rec, 6) AS recall,
        | round(f1, 6) AS f1
        |FROM jf WHERE rn = 1
        |ORDER BY cand_id, n""".stripMargin,

    // q210: q181's chao1 replay, which the Unicode-mode tokenizer must
    // reproduce bit-for-bit on the ASCII corpus (drop-in seam pin)
    "q210_unicode_vocab" ->
      """WITH tf AS (
        | SELECT tok AS token, count(*) AS freq
        | FROM (SELECT unnest(list_filter(string_split(lower(trim(text)), ' '),
        |                     t -> t <> '')) AS tok FROM documents)
        | GROUP BY 1)
        |SELECT CAST(sum(freq) AS BIGINT) AS n_tokens, count(*) AS vocab,
        | CAST(sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        | CAST(sum(CASE WHEN freq = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
        | round(count(*) +
        |  (sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END) * (sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END) - 1))
        |   / (2.0 * (sum(CASE WHEN freq = 2 THEN 1 ELSE 0 END) + 1)), 6) AS chao1
        |FROM tf""".stripMargin,

    // q213: ROUGE-1 of both systems replayed (system B = candidate minus
    // its last token), then the q184 md5 CDF-ladder Poisson draws on the
    // per-pair micro delta, both percentiles, and the win fraction
    "q213_paired_bootstrap" ->
      """WITH d AS (
        | SELECT doc_id, source,
        |  list_filter(string_split(lower(trim(text)), ' '), t -> t <> '') AS toks
        | FROM documents),
        |p AS (
        | SELECT doc_id AS cand_id, toks AS ct, lead(toks) OVER w AS rt
        | FROM d WINDOW w AS (PARTITION BY source ORDER BY doc_id)),
        |pp AS (SELECT cand_id, ct, list_slice(ct, 1, greatest(len(ct) - 1, 0)) AS cb, rt
        |       FROM p WHERE rt IS NOT NULL),
        |rg AS (SELECT cand_id, g, count(*) AS rc
        |       FROM (SELECT cand_id, unnest(rt) AS g FROM pp) GROUP BY 1, 2),
        |ca AS (SELECT cand_id, g, count(*) AS cc
        |       FROM (SELECT cand_id, unnest(ct) AS g FROM pp) GROUP BY 1, 2),
        |cbg AS (SELECT cand_id, g, count(*) AS cc
        |        FROM (SELECT cand_id, unnest(cb) AS g FROM pp) GROUP BY 1, 2),
        |clA AS (SELECT cand_id, COALESCE(sum(least(cc, COALESCE(rc, 0))), 0) AS clipped
        |        FROM ca LEFT JOIN rg USING (cand_id, g) GROUP BY 1),
        |clB AS (SELECT cand_id, COALESCE(sum(least(cc, COALESCE(rc, 0))), 0) AS clipped
        |        FROM cbg LEFT JOIN rg USING (cand_id, g) GROUP BY 1),
        |f1s AS (
        | SELECT pp.cand_id,
        |  CASE WHEN len(pp.ct) = 0 THEN 0.0
        |       ELSE COALESCE(clA.clipped, 0) * 1.0 / len(pp.ct) END AS pa,
        |  CASE WHEN len(pp.rt) = 0 THEN 0.0
        |       ELSE COALESCE(clA.clipped, 0) * 1.0 / len(pp.rt) END AS ra,
        |  CASE WHEN len(pp.cb) = 0 THEN 0.0
        |       ELSE COALESCE(clB.clipped, 0) * 1.0 / len(pp.cb) END AS pb,
        |  CASE WHEN len(pp.rt) = 0 THEN 0.0
        |       ELSE COALESCE(clB.clipped, 0) * 1.0 / len(pp.rt) END AS rb
        | FROM pp LEFT JOIN clA USING (cand_id) LEFT JOIN clB USING (cand_id)),
        |sc AS (
        | SELECT cand_id,
        |  CAST(round(round(CASE WHEN pa + ra = 0 THEN 0.0
        |    ELSE 2.0 * pa * ra / (pa + ra) END, 6) * 1000000) AS BIGINT) AS a_micro,
        |  CAST(round(round(CASE WHEN pb + rb = 0 THEN 0.0
        |    ELSE 2.0 * pb * rb / (pb + rb) END, 6) * 1000000) AS BIGINT) AS b_micro
        | FROM f1s),
        |scd AS (SELECT cand_id, a_micro, b_micro, a_micro - b_micro AS dd FROM sc),
        |reps AS (SELECT b FROM generate_series(1, 200) t(b)),
        |w AS (SELECT dd, b,
        |  (CAST(('0x' || substring(md5(CAST(cand_id AS VARCHAR) || '|' || CAST((b - 1) // 4 AS VARCHAR)),
        |                           1 + 8 * ((b - 1) % 4), 8)) AS BIGINT) + 0.5)
        |    / 4294967296.0 AS u
        | FROM scd CROSS JOIN reps),
        |wt AS (SELECT b, dd,
        |  CASE WHEN u < 0.36787944117144233 THEN 0
        |       WHEN u < 0.7357588823428847 THEN 1
        |       WHEN u < 0.9196986029286058 THEN 2
        |       WHEN u < 0.9810118431238462 THEN 3
        |       WHEN u < 0.9963401531726563 THEN 4
        |       WHEN u < 0.9994058151824183 THEN 5
        |       WHEN u < 0.9999167588507119 THEN 6
        |       ELSE 7 END AS wgt
        | FROM w),
        |m AS (SELECT b, sum(wgt * dd) * 1.0 / sum(wgt) AS mean_b
        |      FROM wt GROUP BY 1),
        |pb AS (SELECT count(*) AS n_replicates,
        |             quantile_cont(mean_b, 0.025) AS lo,
        |             quantile_cont(mean_b, 0.975) AS hi,
        |             avg(CASE WHEN mean_b > 0 THEN 1.0 ELSE 0.0 END) AS fab
        |       FROM m),
        |pt AS (SELECT count(*) AS n, avg(a_micro) AS ma, avg(b_micro) AS mb,
        |              avg(dd) AS md FROM scd)
        |SELECT n, round(ma / 1000000.0, 6) AS mean_a,
        | round(mb / 1000000.0, 6) AS mean_b,
        | round(md / 1000000.0, 6) AS delta, n_replicates,
        | round(lo / 1000000.0, 6) AS ci_lo, round(hi / 1000000.0, 6) AS ci_hi,
        | round(fab, 6) AS frac_a_better
        |FROM pb CROSS JOIN pt""".stripMargin,

    // q214: strategy choice must never change WHICH rows meet — the
    // oracle is the PLAIN join of the same rekeyed tables (q47/q61
    // salt-invariance precedent)
    "q214_adaptive_join" ->
      """WITH li AS (
        | SELECT CASE WHEN l_orderkey % 3 = 0 THEN 1 ELSE l_orderkey END AS k,
        |  l_extendedprice, l_discount
        | FROM lineitem),
        |o AS (SELECT o_orderkey AS k, o_orderpriority FROM orders)
        |SELECT o_orderpriority,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS n_items
        |FROM li JOIN o USING (k)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q215: the q163 dHash bit grid reconstructed from the 16-color GIF
    // palette closed form — j = (id + 3x + 5y) mod 16, rgb = (17j,
    // 37j mod 256, 53j mod 256); GIF is palette-exact so every bit must
    // match the generator
    "q215_gif_dhash" ->
      """WITH m AS (
        | SELECT r.i AS media_id, CAST(16 + (r.i % 6) * 8 AS INT) AS w,
        |  CAST(16 + (r.i % 5) * 8 AS INT) AS h
        | FROM range(300) r(i) WHERE r.i % 3 = 0),
        |px AS (
        | SELECT m.media_id, (xx.x * 9) // m.w AS cx, (yy.y * 8) // m.h AS cy,
        |    299 * (((m.media_id + 3 * xx.x + 5 * yy.y) % 16) * 17)
        |  + 587 * ((((m.media_id + 3 * xx.x + 5 * yy.y) % 16) * 37) % 256)
        |  + 114 * ((((m.media_id + 3 * xx.x + 5 * yy.y) % 16) * 53) % 256) AS luma
        | FROM m, unnest(range(0, m.w)) xx(x), unnest(range(0, m.h)) yy(y)),
        |cells AS (
        | SELECT media_id, cx, cy, CAST(sum(luma) AS BIGINT) AS s, count(*) AS n
        | FROM px GROUP BY 1, 2, 3),
        |bits AS (
        | SELECT a.media_id, a.cy, a.cx,
        |  CASE WHEN b.s * a.n > a.s * b.n THEN 1 ELSE 0 END AS bit
        | FROM cells a JOIN cells b
        |   ON a.media_id = b.media_id AND a.cy = b.cy AND b.cx = a.cx + 1
        | WHERE a.cx < 8),
        |nib AS (SELECT media_id, (cy * 8 + cx) // 4 AS ni,
        |         CAST(sum(bit << ((cy * 8 + cx) % 4)) AS INT) AS v
        |        FROM bits GROUP BY 1, 2)
        |SELECT media_id,
        | string_agg(substr('0123456789abcdef', v + 1, 1), '' ORDER BY ni DESC) AS dhash
        |FROM nib GROUP BY media_id ORDER BY media_id""".stripMargin,

    // q216: the Unicode tokenizer degrades EXACTLY to whitespace tokens
    // on the single-space ASCII oracle corpus (the q209-pinned
    // contract), so the q23 brute-force Jaccard oracle applies verbatim
    "q216_unicode_dedup" -> jaccardOracle,

    // q217: chunk-coverage md5 identity (chunks concat back to the raw
    // text), token-count conservation, and the budget verdict — the
    // md5-verdict convention for non-SQL-replayable segmentation
    "q217_sentence_chunks" ->
      """SELECT doc_id, md5(text) AS chunks_md5,
        | CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT)
        |   AS tok_total,
        | true AS ok_budget
        |FROM documents WHERE text IS NOT NULL AND text <> ''
        |ORDER BY doc_id""".stripMargin,

    // q218: both references' token-Levenshtein DPs replayed with the
    // q207 recursive anti-diagonal CTE, keyed by (cand, ref index);
    // winner = (wer ASC, idx ASC) row_number — the engine's array_min
    "q218_wer_multi" ->
      s"""WITH RECURSIVE $multiRefPairCtes,
        |ppr AS (
        | SELECT cand_id, j.ridx, ct,
        |  CASE WHEN j.ridx = 1 THEN r1 ELSE r2 END AS rt
        | FROM pp, (SELECT unnest([1, 2]) AS ridx) j),
        |ppm AS (SELECT cand_id, ridx, ct, rt, len(ct) AS n, len(rt) AS m
        |        FROM ppr),
        |rec AS (
        | SELECT cand_id, ridx, n, m, ct, rt, CAST(1 AS BIGINT) AS d,
        |  list_transform(range(greatest(0, 1 - m), least(n, 1) + 1),
        |   i -> CASE WHEN i = 0 THEN CAST(1 AS BIGINT) ELSE CAST(i AS BIGINT) END) AS cur,
        |  [CAST(0 AS BIGINT)] AS prev
        | FROM ppm WHERE n + m >= 1
        | UNION ALL
        | SELECT cand_id, ridx, n, m, ct, rt, d + 1,
        |  list_transform(range(greatest(0, d + 1 - m), least(n, d + 1) + 1),
        |   i -> CASE
        |     WHEN i = 0 THEN CAST(d + 1 AS BIGINT)
        |     WHEN d + 1 - i = 0 THEN CAST(i AS BIGINT)
        |     ELSE least(
        |       prev[CAST(i - 1 - greatest(0, d - 1 - m) + 1 AS INT)]
        |         + (CASE WHEN ct[CAST(i AS INT)] = rt[CAST(d + 1 - i AS INT)] THEN 0 ELSE 1 END),
        |       least(
        |         cur[CAST(i - 1 - greatest(0, d - m) + 1 AS INT)] + 1,
        |         cur[CAST(i - greatest(0, d - m) + 1 AS INT)] + 1)) END) AS cur,
        |  cur AS prev
        | FROM rec WHERE d < n + m),
        |ed AS (SELECT cand_id, ridx, cur[1] AS edits FROM rec WHERE d = n + m),
        |mt AS (
        | SELECT p.cand_id, p.ridx,
        |  CAST(p.n AS BIGINT) AS h_len, CAST(p.m AS BIGINT) AS r_len,
        |  CAST(CASE WHEN p.n + p.m = 0 THEN 0 ELSE e.edits END AS BIGINT) AS edits
        | FROM ppm p LEFT JOIN ed e ON p.cand_id = e.cand_id AND p.ridx = e.ridx),
        |sc AS (
        | SELECT cand_id, ridx, h_len, r_len, edits,
        |  CASE WHEN r_len > 0 THEN CAST(edits AS DOUBLE) / r_len
        |       WHEN h_len = 0 THEN 0.0 ELSE 1.0 END AS wer,
        |  row_number() OVER (PARTITION BY cand_id
        |    ORDER BY CASE WHEN r_len > 0 THEN CAST(edits AS DOUBLE) / r_len
        |               WHEN h_len = 0 THEN 0.0 ELSE 1.0 END ASC, ridx ASC) AS rn
        | FROM mt)
        |SELECT cand_id, h_len, CAST(ridx - 1 AS BIGINT) AS ref_idx, r_len,
        | edits, round(wer, 6) AS wer
        |FROM sc WHERE rn = 1
        |ORDER BY cand_id""".stripMargin,
    // all-occurrence counts (overlaps included) per pattern via a
    // position-range substring scan — the brute-force restatement of the
    // Aho–Corasick automaton's emit totals
    "q219_blocklist" -> {
      val pats = Seq("vector", "sort", "window sort", "batch batch",
        "customer", "hash join")
      val perPat = pats.map(p =>
        s"max(CASE WHEN pat = '$p' THEN cnt END)::BIGINT AS hits_${p.replace(' ', '_')}")
        .mkString(",\n ")
      val values = pats.map(p => s"('$p')").mkString(", ")
      s"""WITH pats AS (SELECT * FROM (VALUES $values) p(pat)),
        |hits AS (
        | SELECT d.doc_id, p.pat,
        |  CAST(len(list_filter(range(1, len(lower(d.text)) - len(p.pat) + 2),
        |   i -> substring(lower(d.text), CAST(i AS INT), CAST(len(p.pat) AS INT)) = p.pat)) AS BIGINT) AS cnt
        | FROM documents d CROSS JOIN pats p)
        |SELECT doc_id,
        | sum(cnt)::BIGINT AS hits_total,
        | sum(CASE WHEN cnt > 0 THEN 1 ELSE 0 END)::BIGINT AS patterns_hit,
        | coalesce(sum(cnt) > 0, false) AS blocked,
        | $perPat
        |FROM hits GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin
    },
    "q220_bitext_margin" ->
      """WITH src AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  WHERE vec_id % 2 = 0 AND vec_id < 200),
        |tgt AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 1),
        |fwd AS (
        | SELECT x, y, c FROM (
        |  SELECT s.vec_id AS x, t.vec_id AS y,
        |   list_cosine_similarity(s.embedding::DOUBLE[], t.embedding::DOUBLE[]) AS c,
        |   row_number() OVER (PARTITION BY s.vec_id
        |     ORDER BY list_cosine_similarity(s.embedding::DOUBLE[], t.embedding::DOUBLE[]) DESC,
        |              t.vec_id ASC) AS rn
        |  FROM src s CROSS JOIN tgt t) f WHERE rn <= 4),
        |bwd AS (
        | SELECT x, y, c FROM (
        |  SELECT s.vec_id AS x, t.vec_id AS y,
        |   list_cosine_similarity(t.embedding::DOUBLE[], s.embedding::DOUBLE[]) AS c,
        |   row_number() OVER (PARTITION BY t.vec_id
        |     ORDER BY list_cosine_similarity(t.embedding::DOUBLE[], s.embedding::DOUBLE[]) DESC,
        |              s.vec_id ASC) AS rn
        |  FROM (SELECT e.vec_id, e.embedding FROM embeddings e
        |        JOIN (SELECT DISTINCT y FROM fwd) ys ON e.vec_id = ys.y) t
        |  CROSS JOIN src s) b WHERE rn <= 4),
        |af AS (SELECT x, avg(c) AS a_fwd FROM fwd GROUP BY x),
        |ab AS (SELECT y, avg(c) AS a_bwd FROM bwd GROUP BY y),
        |mf AS (SELECT f.x, f.y, f.c, f.c / ((af.a_fwd + ab.a_bwd) / 2) AS margin
        |       FROM fwd f JOIN af ON f.x = af.x JOIN ab ON f.y = ab.y),
        |mb AS (SELECT b.x, b.y, b.c / ((af.a_fwd + ab.a_bwd) / 2) AS margin
        |       FROM bwd b JOIN af ON b.x = af.x JOIN ab ON b.y = ab.y),
        |bf AS (SELECT x, y, c, margin FROM (
        |  SELECT *, row_number() OVER (PARTITION BY x ORDER BY margin DESC, y ASC) AS rn
        |  FROM mf) t WHERE rn = 1),
        |bb AS (SELECT x, y FROM (
        |  SELECT *, row_number() OVER (PARTITION BY y ORDER BY margin DESC, x ASC) AS rn
        |  FROM mb) t WHERE rn = 1)
        |SELECT bf.x AS src_id, bf.y AS tgt_id,
        | round(bf.c, 6) AS cosine_sim, round(bf.margin, 6) AS margin
        |FROM bf JOIN bb ON bf.x = bb.x AND bf.y = bb.y
        |WHERE bf.margin >= 1.0
        |ORDER BY src_id, tgt_id""".stripMargin,
    // the exact LPT placement sequence, replayed: shard = argmin of the
    // four running loads (ties to the lowest index), stepped per source
    // in (n_tokens DESC, doc_id ASC) rank order
    "q221_lpt_shards" -> {
      val pick =
        """CASE WHEN st.l0 <= st.l1 AND st.l0 <= st.l2 AND st.l0 <= st.l3 THEN 0
          |     WHEN st.l1 <= st.l2 AND st.l1 <= st.l3 THEN 1
          |     WHEN st.l2 <= st.l3 THEN 2 ELSE 3 END""".stripMargin
      def load(i: Int) =
        s"st.l$i + CASE WHEN ($pick) = $i THEN d.n_tokens ELSE 0 END"
      s"""WITH RECURSIVE docs AS (
        | SELECT source, doc_id,
        |  CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY len(string_split(trim(text), ' ')) DESC, doc_id) AS rn
        | FROM documents),
        |st AS (
        | SELECT source, CAST(0 AS BIGINT) AS rn,
        |  CAST(0 AS BIGINT) AS l0, CAST(0 AS BIGINT) AS l1,
        |  CAST(0 AS BIGINT) AS l2, CAST(0 AS BIGINT) AS l3,
        |  CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS n_tokens,
        |  CAST(NULL AS BIGINT) AS shard
        | FROM (SELECT DISTINCT source FROM docs) g
        | UNION ALL
        | SELECT d.source, d.rn,
        |  ${load(0)}, ${load(1)}, ${load(2)}, ${load(3)},
        |  d.doc_id, d.n_tokens, CAST(($pick) AS BIGINT)
        | FROM st JOIN docs d ON d.source = st.source AND d.rn = st.rn + 1)
        |SELECT s.source AS "group", s.doc_id AS id, s.n_tokens, s.shard
        |FROM st s WHERE s.doc_id IS NOT NULL
        |ORDER BY id""".stripMargin
    },
    // q30's hit CTE + confidence/argmax arithmetic, binned; ECE = the
    // n-weighted mean absolute (accuracy - confidence) gap over the bins
    "q222_calibration_ece" ->
      s"""WITH $langCalibrationCtes,
        |tot AS (SELECT sum(abs(accuracy - avg_conf) * n) / sum(n) AS ece FROM bb)
        |SELECT bin, n, round(avg_conf, 6) AS avg_conf,
        | round(accuracy, 6) AS accuracy,
        | round(abs(accuracy - avg_conf), 6) AS gap, round(ece, 6) AS ece
        |FROM bb, tot
        |ORDER BY bin""".stripMargin,

    // q227: the q222 bins + the PAV minimax closed form — pooled range
    // means from prefix sums, min over j >= k, max over i <= k; exact
    // bounded-bin arithmetic, identical float fold order both engines
    "q227_isotonic_fit" ->
      s"""WITH $langCalibrationCtes,
        |pre AS (SELECT bin, n, avg_conf, accuracy,
        |  sum(n) OVER (ORDER BY bin) AS cw,
        |  sum(accuracy * n) OVER (ORDER BY bin) AS cs FROM bb),
        |rg AS (SELECT a.bin AS i, b.bin AS j,
        |  (b.cs - (a.cs - a.accuracy * a.n)) / (b.cw - (a.cw - a.n)) AS m
        |  FROM pre a JOIN pre b ON a.bin <= b.bin),
        |mn AS (SELECT k.bin, rg.i, min(rg.m) AS mn FROM bb k
        |  JOIN rg ON rg.i <= k.bin AND rg.j >= k.bin GROUP BY 1, 2),
        |fit AS (SELECT bin, max(mn) AS iso_fit FROM mn GROUP BY 1)
        |SELECT bb.bin, bb.n, round(bb.avg_conf, 6) AS avg_conf,
        | round(bb.accuracy, 6) AS accuracy, round(fit.iso_fit, 6) AS iso_fit
        |FROM bb JOIN fit ON bb.bin = fit.bin
        |ORDER BY bb.bin""".stripMargin,

    // q228: features restated with the q217 tokenization pairing, then
    // the 5 GD steps unrolled (gradient avg from the previous weights,
    // z folded left-associatively exactly as the engine builds it)
    "q228_logreg_gd" ->
      s"""WITH ${logregFeatureCte("CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END",
          "lang IS NOT NULL AND n_chars IS NOT NULL")},
        |wt0 AS (SELECT 0.0 AS b, 0.0 AS c0, 0.0 AS c1, 0.0 AS c2),
        |${gdIterationCtes(5)},
        |mt AS MATERIALIZED (
        | SELECT count(*)::BIGINT AS n,
        |  avg(CASE WHEN (p >= 0.5) = (y = 1.0) THEN 1.0 ELSE 0.0 END) AS acc,
        |  avg(-(y * ln(greatest(least(p, 1.0 - 1e-15), 1e-15))
        |    + (1.0 - y) * ln(1.0 - greatest(least(p, 1.0 - 1e-15), 1e-15)))) AS loss
        | FROM (SELECT ft.y,
        |    1.0 / (1.0 + exp(-(wt5.b + ft.x0 * wt5.c0 + ft.x1 * wt5.c1 + ft.x2 * wt5.c2))) AS p
        |   FROM ft, wt5) t)
        |SELECT t.term_idx, t.term, round(t.w, 6) AS weight, mt.n,
        | round(mt.acc, 6) AS accuracy, round(mt.loss, 6) AS log_loss
        |FROM (
        | SELECT 0::BIGINT AS term_idx, 'bias' AS term, (SELECT b FROM wt5) AS w
        | UNION ALL SELECT 1::BIGINT, 'len_k', (SELECT c0 FROM wt5)
        | UNION ALL SELECT 2::BIGINT, 'stop_frac', (SELECT c1 FROM wt5)
        | UNION ALL SELECT 3::BIGINT, 'tok_len', (SELECT c2 FROM wt5)) t, mt
        |ORDER BY t.term_idx""".stripMargin,

    // q229: the waterfilling closed form restated — row_number over
    // (cap, source), prefix sums, m* by the max-m condition, τ from
    // (budget − P_m*)/(k − m*), allocation = min(cap, τ)
    "q229_unimax_mix" ->
      """WITH dt AS (
        | SELECT source,
        |  CAST(len(list_filter(string_split(lower(trim(text)), ' '), t -> t <> '')) AS BIGINT) AS ntok
        | FROM documents),
        |c AS (SELECT source, count(*)::BIGINT AS n_docs,
        |       CAST(sum(ntok) AS DOUBLE) AS tokens FROM dt GROUP BY 1),
        |b AS (SELECT 2.0 * sum(tokens) AS budget FROM c),
        |o AS (SELECT c.*, tokens * 4.0 AS cap,
        |       CAST(row_number() OVER (ORDER BY tokens * 4.0, source) AS BIGINT) AS i
        |      FROM c),
        |p AS (SELECT o.*, sum(cap) OVER (ORDER BY i) AS P,
        |       (SELECT count(*) FROM o) AS k FROM o),
        |m AS (SELECT coalesce(max(CASE WHEN cap * (k - i) + P <= (SELECT budget FROM b)
        |                               THEN i END), 0) AS m FROM p),
        |sel AS (SELECT m.m,
        |        coalesce((SELECT P FROM p WHERE p.i = m.m), 0.0) AS pm FROM m),
        |f AS (SELECT p.*, sel.m, sel.pm,
        |       ((SELECT budget FROM b) - sel.pm)
        |         / nullif(CAST(k - sel.m AS DOUBLE), 0.0) AS tau
        |      FROM p, sel),
        |a AS (SELECT f.*, CASE WHEN m = k THEN cap ELSE least(cap, tau) END AS alloc
        |      FROM f)
        |SELECT source, n_docs, tokens,
        | round(alloc, 6) AS alloc_tokens,
        | round(alloc / nullif(tokens, 0.0), 6) AS epochs,
        | round(alloc / (SELECT budget FROM b), 6) AS share
        |FROM a ORDER BY source""".stripMargin,

    // q230: expected counts from the marginals over the FULL r×c grid
    // (zero-observed cells included via the null-safe left join)
    "q230_chi_square" ->
      """WITH cells AS (
        | SELECT source AS a, lang AS b, count(*)::BIGINT AS o
        | FROM documents GROUP BY 1, 2),
        |ma AS (SELECT a, sum(o)::BIGINT AS na FROM cells GROUP BY 1),
        |mb AS (SELECT b, sum(o)::BIGINT AS nb FROM cells GROUP BY 1),
        |tt AS (SELECT (SELECT sum(o)::BIGINT FROM cells) AS n,
        |  (SELECT count(*)::BIGINT FROM ma) AS r,
        |  (SELECT count(*)::BIGINT FROM mb) AS c),
        |grid AS (SELECT ma.na, mb.nb, cells.o
        | FROM ma CROSS JOIN mb
        | LEFT JOIN cells ON cells.a IS NOT DISTINCT FROM ma.a
        |                AND cells.b IS NOT DISTINCT FROM mb.b),
        |ch AS (SELECT sum(
        |   (coalesce(o, 0) - CAST(na AS DOUBLE) * nb / (SELECT n FROM tt))
        |   * (coalesce(o, 0) - CAST(na AS DOUBLE) * nb / (SELECT n FROM tt))
        |   / (CAST(na AS DOUBLE) * nb / (SELECT n FROM tt))) AS chi2 FROM grid)
        |SELECT tt.n, tt.r, tt.c, (tt.r - 1) * (tt.c - 1) AS dof,
        | round(ch.chi2, 6) AS chi2,
        | round(sqrt(ch.chi2 / (tt.n * nullif(least(tt.r - 1, tt.c - 1), 0))), 6)
        |   AS cramers_v
        |FROM tt, ch""".stripMargin,

    // q231: the q223 rank algebra extended with the Σ(t³−t) tie term;
    // z from the tie-corrected variance, NULL on a one-sided input
    "q231_mann_whitney" ->
      """WITH g AS (
        | SELECT CAST(n_chars AS DOUBLE) AS s,
        |  sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS p,
        |  sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)::BIGINT AS n
        | FROM documents
        | WHERE n_chars IS NOT NULL AND lang IS NOT NULL GROUP BY 1),
        |c AS (
        | SELECT p, n,
        |  COALESCE(sum(n) OVER (ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cn,
        |  sum(p) OVER () AS bigp, sum(n) OVER () AS bign
        | FROM g),
        |agg AS (
        | SELECT max(bigp)::BIGINT AS n_pos, max(bign)::BIGINT AS n_neg,
        |  sum(CAST(p AS DOUBLE) * cn) AS w, sum(CAST(p AS DOUBLE) * n) AS t,
        |  sum(CAST(p + n AS DOUBLE) * (p + n) * (p + n)
        |      - CAST(p + n AS DOUBLE)) AS ties
        | FROM c)
        |SELECT n_pos, n_neg,
        | round(CASE WHEN n_pos > 0 AND n_neg > 0 THEN w + t / 2 END, 6) AS u,
        | round(CASE WHEN n_pos > 0 AND n_neg > 0 THEN
        |   ((w + t / 2) - CAST(n_pos AS DOUBLE) * n_neg / 2)
        |   / nullif(sqrt(CAST(n_pos AS DOUBLE) * n_neg / 12
        |       * ((CAST(n_pos AS DOUBLE) + n_neg + 1)
        |          - ties / ((CAST(n_pos AS DOUBLE) + n_neg)
        |                    * (CAST(n_pos AS DOUBLE) + n_neg - 1)))), 0.0)
        |  END, 6) AS z
        |FROM agg""".stripMargin,

    // q232: inclusive class CDFs from the same prefix sums; D = max
    // gap, scaled by sqrt(n1*n2/(n1+n2))
    "q232_ks_test" ->
      """WITH g AS (
        | SELECT CAST(n_chars AS DOUBLE) AS s,
        |  sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS p,
        |  sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)::BIGINT AS n
        | FROM documents
        | WHERE n_chars IS NOT NULL AND lang IS NOT NULL GROUP BY 1),
        |c AS (
        | SELECT p, n,
        |  COALESCE(sum(p) OVER (ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cp,
        |  COALESCE(sum(n) OVER (ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cn,
        |  sum(p) OVER () AS bigp, sum(n) OVER () AS bign
        | FROM g),
        |agg AS (
        | SELECT max(bigp)::BIGINT AS n_pos, max(bign)::BIGINT AS n_neg,
        |  max(abs(CAST(cp + p AS DOUBLE) / bigp
        |          - CAST(cn + n AS DOUBLE) / bign)) AS d
        | FROM c)
        |SELECT n_pos, n_neg,
        | round(CASE WHEN n_pos > 0 AND n_neg > 0 THEN d END, 6) AS d,
        | round(CASE WHEN n_pos > 0 AND n_neg > 0 THEN
        |   sqrt(CAST(n_pos AS DOUBLE) * n_neg
        |        / (CAST(n_pos AS DOUBLE) + n_neg)) * d END, 6) AS ks_stat
        |FROM agg""".stripMargin,

    // q233: the full train→score→audit chain — q228's GD CTEs, scoring
    // with the 6-dp-ROUNDED trained weights (the cross-engine drift
    // cut), then q222's binning/ECE and q223's AUC algebra over the
    // trained confidences
    "q233_train_eval" ->
      s"""WITH ${logregFeatureCte("CASE WHEN n_chars > 300 THEN 1.0 ELSE 0.0 END",
          "n_chars IS NOT NULL")},
        |wt0 AS (SELECT 0.0 AS b, 0.0 AS c0, 0.0 AS c1, 0.0 AS c2),
        |${gdIterationCtes(50, learningRate = "3.0")},
        |wr AS (SELECT round(b, 6) AS b, round(c0, 6) AS c0,
        |        round(c1, 6) AS c1, round(c2, 6) AS c2 FROM wt50),
        |sc AS MATERIALIZED (
        | SELECT 1.0 / (1.0 + exp(-(wr.b + ft.x0 * wr.c0
        |    + ft.x1 * wr.c1 + ft.x2 * wr.c2))) AS conf, ft.y
        | FROM ft, wr),
        |bb AS (
        | SELECT CAST(least(greatest(floor(conf * 10), 0), 9) AS BIGINT) AS bin,
        |  count(*)::BIGINT AS n, avg(conf) AS avg_conf,
        |  avg(CASE WHEN y = 1.0 THEN 1.0 ELSE 0.0 END) AS accuracy
        | FROM sc GROUP BY 1),
        |tot AS (SELECT sum(abs(accuracy - avg_conf) * n) / sum(n) AS ece FROM bb),
        |g AS (
        | SELECT conf AS s,
        |  sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END)::BIGINT AS p,
        |  sum(CASE WHEN y = 1.0 THEN 0 ELSE 1 END)::BIGINT AS n
        | FROM sc GROUP BY 1),
        |cc AS (
        | SELECT p, n,
        |  COALESCE(sum(p) OVER (ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cp,
        |  COALESCE(sum(n) OVER (ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cn,
        |  sum(p) OVER () AS bigp, sum(n) OVER () AS bign
        | FROM g),
        |auc AS (
        | SELECT
        |  round(CASE WHEN max(bigp) > 0 AND max(bign) > 0 THEN
        |    (sum(CAST(p AS DOUBLE) * cn) + sum(CAST(p AS DOUBLE) * n) / 2)
        |     / (CAST(max(bigp) AS DOUBLE) * max(bign)) END, 6) AS roc_auc,
        |  round(CASE WHEN max(bigp) > 0 THEN
        |    sum((CAST(p AS DOUBLE) / bigp)
        |      * (CAST(bigp - cp AS DOUBLE) / ((bigp - cp) + (bign - cn)))) END, 6)
        |    AS pr_auc
        | FROM cc)
        |SELECT bb.bin, bb.n, round(bb.avg_conf, 6) AS avg_conf,
        | round(bb.accuracy, 6) AS accuracy, round(tot.ece, 6) AS ece,
        | auc.roc_auc, auc.pr_auc
        |FROM bb, tot, auc
        |ORDER BY bb.bin""".stripMargin,

    // q234: the EWMA recurrence replayed as the closed-form power sum
    // s_t = 0.9^(t-1)·x_1 + Σ 0.1·0.9^(t-j)·x_j over an rn self-join
    "q234_ewma" ->
      """WITH e AS (
        | SELECT event_type, event_id, CAST(value AS DOUBLE) AS x,
        |  CAST(row_number() OVER (PARTITION BY event_type
        |       ORDER BY ts, event_id) AS BIGINT) AS rn
        | FROM events WHERE value IS NOT NULL),
        |s AS (
        | SELECT a.event_type, a.event_id,
        |  sum(CASE WHEN b.rn = 1 THEN power(0.9, a.rn - 1) * b.x
        |           ELSE 0.1 * power(0.9, a.rn - b.rn) * b.x END) AS ewma
        | FROM e a JOIN e b
        |   ON a.event_type = b.event_type AND b.rn <= a.rn
        | GROUP BY 1, 2)
        |SELECT event_type, event_id, round(ewma, 6) AS ewma FROM s
        |ORDER BY event_type, event_id""".stripMargin,

    // q235: the pooled-SE two-proportion z restated scalar-for-scalar
    "q235_two_proportion" ->
      """WITH c AS (
        | SELECT (doc_id % 2 = 0) AS g, count(*)::BIGINT AS n,
        |  sum(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END) AS k
        | FROM documents
        | WHERE doc_id IS NOT NULL AND lang IS NOT NULL GROUP BY 1),
        |a AS (
        | SELECT sum(CASE WHEN g THEN n END)::BIGINT AS n1,
        |  sum(CASE WHEN NOT g THEN n END)::BIGINT AS n2,
        |  sum(CASE WHEN g THEN k END) AS k1,
        |  sum(CASE WHEN NOT g THEN k END) AS k2
        | FROM c)
        |SELECT n1, n2,
        | round(CASE WHEN n1 > 0 THEN k1 / CAST(n1 AS DOUBLE) END, 6) AS p1,
        | round(CASE WHEN n2 > 0 THEN k2 / CAST(n2 AS DOUBLE) END, 6) AS p2,
        | round(CASE WHEN n1 > 0 AND n2 > 0 THEN
        |   (k1 / CAST(n1 AS DOUBLE) - k2 / CAST(n2 AS DOUBLE))
        |   / nullif(sqrt((k1 + k2) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |       * (1.0 - (k1 + k2) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
        |       * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))), 0.0)
        |  END, 6) AS z
        |FROM a""".stripMargin,

    // q236: fixed-grid binning with tail clamp, +0.5 Laplace smoothing
    // on the densified grid, PSI = Σ (p−q)·ln(p/q)
    "q236_psi" ->
      """WITH e AS (
        | SELECT (ts < TIMESTAMP '2024-01-15') AS g, CAST(value AS DOUBLE) AS s
        | FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |cells AS (
        | SELECT CAST(least(greatest(floor((s - 0.0) / 500.0 * 10), 0.0), 9.0) AS BIGINT) AS bin,
        |  sum(CASE WHEN g THEN 1 ELSE 0 END)::BIGINT AS ne,
        |  sum(CASE WHEN NOT g THEN 1 ELSE 0 END)::BIGINT AS na
        | FROM e GROUP BY 1),
        |grid AS (SELECT unnest(range(0, 10)) AS bin),
        |f AS (SELECT grid.bin, coalesce(ne, 0) AS ne, coalesce(na, 0) AS na
        |      FROM grid LEFT JOIN cells ON grid.bin = cells.bin),
        |tt AS (SELECT sum(ne) AS te, sum(na) AS ta FROM f),
        |sc AS (SELECT bin, ne, na,
        |  (CAST(ne AS DOUBLE) + 0.5) / (te + 0.5 * 10) AS p,
        |  (CAST(na AS DOUBLE) + 0.5) / (ta + 0.5 * 10) AS q
        | FROM f, tt),
        |ps AS (SELECT sum((p - q) * ln(p / q)) AS psi FROM sc)
        |SELECT bin, ne AS n_expected, na AS n_actual,
        | round(p, 6) AS p_expected, round(q, 6) AS q_actual,
        | round((p - q) * ln(p / q), 6) AS contrib, round(ps.psi, 6) AS psi
        |FROM sc, ps ORDER BY bin""".stripMargin,

    // q237: the q184 block-md5 Poisson draws feeding the weighted
    // rank-sum AUC per replicate, quantile_cont percentile CI + the
    // q223 point algebra
    "q237_auc_ci" ->
      """WITH r AS (
        | SELECT CAST(doc_id AS VARCHAR) AS id, CAST(n_chars AS DOUBLE) AS s,
        |  CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
        | FROM documents
        | WHERE n_chars IS NOT NULL AND lang IS NOT NULL AND doc_id IS NOT NULL),
        |reps AS (SELECT b FROM generate_series(1, 100) t(b)),
        |w AS (SELECT id, s, y, b,
        |  (CAST(('0x' || substring(md5(id || '|' || CAST((b - 1) // 4 AS VARCHAR)),
        |                           1 + 8 * ((b - 1) % 4), 8)) AS BIGINT) + 0.5)
        |    / 4294967296.0 AS u
        | FROM r CROSS JOIN reps),
        |wt AS (SELECT b, s, y,
        |  CASE WHEN u < 0.36787944117144233 THEN 0
        |       WHEN u < 0.7357588823428847 THEN 1
        |       WHEN u < 0.9196986029286058 THEN 2
        |       WHEN u < 0.9810118431238462 THEN 3
        |       WHEN u < 0.9963401531726563 THEN 4
        |       WHEN u < 0.9994058151824183 THEN 5
        |       WHEN u < 0.9999167588507119 THEN 6
        |       ELSE 7 END AS wgt
        | FROM w),
        |g AS (SELECT b, s, sum(wgt * y) AS p, sum(wgt * (1.0 - y)) AS n
        |      FROM wt GROUP BY 1, 2),
        |c AS (SELECT b, p, n,
        |  COALESCE(sum(n) OVER (PARTITION BY b ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS cn
        | FROM g),
        |a AS (SELECT b, sum(p) AS bp, sum(n) AS bn,
        |       sum(p * cn) AS u_, sum(p * n) AS t_ FROM c GROUP BY 1),
        |aucs AS (SELECT CASE WHEN bp > 0 AND bn > 0
        |   THEN (u_ + t_ / 2) / (bp * bn) END AS auc FROM a),
        |ci AS (SELECT count(auc)::BIGINT AS n_replicates,
        |        round(quantile_cont(auc, 0.025), 6) AS ci_lo,
        |        round(quantile_cont(auc, 0.975), 6) AS ci_hi FROM aucs),
        |gg AS (
        | SELECT s, sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END)::BIGINT AS p,
        |  sum(CASE WHEN y = 1.0 THEN 0 ELSE 1 END)::BIGINT AS n
        | FROM r GROUP BY 1),
        |cc AS (
        | SELECT p, n,
        |  COALESCE(sum(n) OVER (ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cn,
        |  sum(p) OVER () AS bigp, sum(n) OVER () AS bign
        | FROM gg),
        |pt AS (
        | SELECT max(bigp)::BIGINT AS n_pos, max(bign)::BIGINT AS n_neg,
        |  round(CASE WHEN max(bigp) > 0 AND max(bign) > 0 THEN
        |    (sum(CAST(p AS DOUBLE) * cn) + sum(CAST(p AS DOUBLE) * n) / 2)
        |     / (CAST(max(bigp) AS DOUBLE) * max(bign)) END, 6) AS roc_auc
        | FROM cc)
        |SELECT pt.n_pos, pt.n_neg, pt.roc_auc,
        | ci.n_replicates, ci.ci_lo, ci.ci_hi
        |FROM pt, ci""".stripMargin,

    // q223/q224: the rank-sum ROC AUC (tie pairs at ½) and step-wise
    // average precision restated from the same distinct-score
    // contingency + window prefix sums; q224 is the identical algebra
    // partitioned by source
    "q223_binary_eval" -> aucOracle(None),
    "q224_auc_by_source" -> aucOracle(Some("source")),

    // q225: fractional ranks from the per-group distinct-value
    // contingency (count-smaller + (ties+1)/2) joined back, then plain
    // corr on ranks — the q82 corr-parity precedent at 6 dp
    "q225_spearman" ->
      """WITH r0 AS (
        | SELECT event_type, CAST(value AS DOUBLE) AS x,
        |  CAST(epoch_ns(ts) AS DOUBLE) AS y
        | FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
        |gx AS (SELECT event_type, x, count(*)::BIGINT AS c FROM r0 GROUP BY 1, 2),
        |rx AS (SELECT event_type, x,
        |  COALESCE(sum(c) OVER (PARTITION BY event_type ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |  + CAST(c + 1 AS DOUBLE) / 2 AS rkx FROM gx),
        |gy AS (SELECT event_type, y, count(*)::BIGINT AS c FROM r0 GROUP BY 1, 2),
        |ry AS (SELECT event_type, y,
        |  COALESCE(sum(c) OVER (PARTITION BY event_type ORDER BY y
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |  + CAST(c + 1 AS DOUBLE) / 2 AS rky FROM gy),
        |j AS (SELECT r0.event_type, rx.rkx, ry.rky
        |      FROM r0
        |      JOIN rx ON r0.event_type = rx.event_type AND r0.x = rx.x
        |      JOIN ry ON r0.event_type = ry.event_type AND r0.y = ry.y)
        |SELECT event_type, count(*)::BIGINT AS n,
        | round(corr(rkx, rky), 6) AS rho
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    // q226: pairwise outcomes from the same lead window, then the 5 MM
    // iterations unrolled as chained CTEs (btIterationCtes) — rank on
    // the ROUNDED strength so a last-ulp engine difference cannot flip
    "q226_bradley_terry" ->
      s"""WITH ev AS (
        | SELECT user_id, event_type, value,
        |  lead(event_type) OVER win AS nt, lead(value) OVER win AS nv
        | FROM events
        | WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |pf AS (
        | SELECT CASE WHEN value > nv THEN event_type ELSE nt END AS w,
        |        CASE WHEN value > nv THEN nt ELSE event_type END AS l
        | FROM ev
        | WHERE nt IS NOT NULL AND value <> nv AND event_type <> nt),
        |pairs AS MATERIALIZED (
        | SELECT w, l, count(*)::BIGINT AS n FROM pf GROUP BY 1, 2),
        |sym AS MATERIALIZED (SELECT i, j, sum(n)::BIGINT AS nij FROM (
        |   SELECT w AS i, l AS j, n FROM pairs
        |   UNION ALL SELECT l AS i, w AS j, n FROM pairs) u
        |  GROUP BY 1, 2),
        |wins AS MATERIALIZED (
        | SELECT w AS i, sum(n)::BIGINT AS wins FROM pairs GROUP BY 1),
        |items AS MATERIALIZED (SELECT DISTINCT i FROM sym),
        |w0 AS MATERIALIZED (
        | SELECT i, 1.0 / (SELECT count(*) FROM items) AS s FROM items),
        |${btIterationCtes(5)},
        |nc AS (SELECT i, sum(nij)::BIGINT AS n_comparisons FROM sym GROUP BY 1),
        |f AS (
        | SELECT items.i AS item, COALESCE(wins.wins, 0)::BIGINT AS n_wins,
        |  nc.n_comparisons, round(w5.s, 6) AS strength
        | FROM items
        | LEFT JOIN wins ON items.i = wins.i
        | JOIN nc ON items.i = nc.i
        | JOIN w5 ON items.i = w5.i)
        |SELECT item, n_wins, n_comparisons, strength,
        | row_number() OVER (ORDER BY strength DESC, item)::BIGINT AS rank
        |FROM f
        |ORDER BY rank""".stripMargin)

  /** q222/q227's shared langId-confidence reliability bins: hits →
    * (conf, correct) → 10 equal-width bins with per-bin n / mean conf /
    * accuracy. Factored so the ECE and the PAV fit replay the SAME
    * binning verbatim.
    */
  private def langCalibrationCtes: String =
    """h AS (
      | SELECT d.doc_id, d.lang,
      |  len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht','ein','eine','mit','von'))) AS de_hits,
      |  len(list_filter(toks, t -> t IN ('the','a','and','is','not','of','to','in','it','that'))) AS en_hits,
      |  len(list_filter(toks, t -> t IN ('el','la','los','las','y','es','no','un','una','de'))) AS es_hits,
      |  len(list_filter(toks, t -> t IN ('le','la','les','et','est','pas','un','une','dans','que'))) AS fr_hits,
      |  len(list_filter(toks, t -> t IN ('的','是','不','了','在','我','有','和','就','人'))) AS zh_hits
      | FROM (SELECT doc_id, lang, string_split(lower(trim(text)), ' ') AS toks
      |       FROM documents) d),
      |scored AS (
      | SELECT doc_id,
      |  CASE WHEN de_hits + en_hits + es_hits + fr_hits + zh_hits = 0 THEN 0.0
      |       ELSE CAST(greatest(de_hits, en_hits, es_hits, fr_hits, zh_hits) AS DOUBLE)
      |            / (de_hits + en_hits + es_hits + fr_hits + zh_hits) END AS conf,
      |  (CASE WHEN greatest(de_hits, en_hits, es_hits, fr_hits, zh_hits) = 0 THEN 'und'
      |        WHEN de_hits >= en_hits AND de_hits >= es_hits AND de_hits >= fr_hits AND de_hits >= zh_hits THEN 'de'
      |        WHEN en_hits >= es_hits AND en_hits >= fr_hits AND en_hits >= zh_hits THEN 'en'
      |        WHEN es_hits >= fr_hits AND es_hits >= zh_hits THEN 'es'
      |        WHEN fr_hits >= zh_hits THEN 'fr'
      |        ELSE 'zh' END = lang) AS correct
      | FROM h),
      |bb AS (
      | SELECT CAST(least(greatest(floor(conf * 10), 0), 9) AS BIGINT) AS bin,
      |  count(*)::BIGINT AS n, avg(conf) AS avg_conf,
      |  avg(CASE WHEN correct THEN 1.0 ELSE 0.0 END) AS accuracy
      | FROM scored WHERE conf IS NOT NULL AND correct IS NOT NULL
      | GROUP BY 1)""".stripMargin

  /** q228/q233's shared feature CTE: a parametrized binary label + the
    * three engine-computed text features (length, stopword fraction,
    * mean token length), q217 tokenization pairing. q228 labels
    * English-ness; q233 labels the recoverable length rule.
    */
  private def logregFeatureCte(labelExpr: String, where: String): String =
    s"""ft AS MATERIALIZED (
      | SELECT $labelExpr AS y,
      |  CAST(n_chars AS DOUBLE) / 1000.0 AS x0,
      |  CASE WHEN ntok = 0 THEN 0.0 ELSE nstop / ntok END AS x1,
      |  CASE WHEN ntok = 0 THEN 0.0 ELSE csum / ntok / 10.0 END AS x2
      | FROM (
      |  SELECT lang, n_chars,
      |   CAST(len(toks) AS DOUBLE) AS ntok,
      |   CAST(len(list_filter(toks, t -> t IN ('the','a','and','of','to','in'))) AS DOUBLE) AS nstop,
      |   CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE) AS csum
      |  FROM (SELECT lang, n_chars,
      |         list_filter(string_split(lower(trim(text)), ' '), t -> t <> '') AS toks
      |        FROM documents WHERE text IS NOT NULL) t0) t1
      | WHERE $where)""".stripMargin

  /** q228's unrolled GD steps: grK = the gradient means under wt(K−1),
    * wtK = wt(K−1) − η·grK with η = 1 — the exact per-step arithmetic
    * [[graft.operators.FilterModel.logisticGd]] runs, z folded in the
    * same left-associated order. MATERIALIZED for the q226 reason.
    */
  private def gdIterationCtes(iters: Int, learningRate: String = "1.0"): String =
    (1 to iters).map { k =>
      s"""gr$k AS MATERIALIZED (
        | SELECT avg((p - y) * 1.0) AS g0, avg((p - y) * x0) AS g1,
        |        avg((p - y) * x1) AS g2, avg((p - y) * x2) AS g3
        | FROM (SELECT ft.y, ft.x0, ft.x1, ft.x2,
        |    1.0 / (1.0 + exp(-(wt${k - 1}.b + ft.x0 * wt${k - 1}.c0
        |      + ft.x1 * wt${k - 1}.c1 + ft.x2 * wt${k - 1}.c2))) AS p
        |   FROM ft, wt${k - 1}) t),
        |wt$k AS (SELECT wt${k - 1}.b - $learningRate * gr$k.g0 AS b,
        |  wt${k - 1}.c0 - $learningRate * gr$k.g1 AS c0,
        |  wt${k - 1}.c1 - $learningRate * gr$k.g2 AS c1,
        |  wt${k - 1}.c2 - $learningRate * gr$k.g3 AS c2
        | FROM wt${k - 1}, gr$k)""".stripMargin
    }.mkString(",\n")

  /** q223/q224's shared AUC oracle: `slice` = None is the global form,
    * Some(col) partitions every window and the final reduction by the
    * slice column — the exact algebra of
    * [[graft.operators.Stats.binaryEvalAgg]] restated over window
    * prefix sums (fine at oracle scale; the engine's global form uses
    * the two-phase scan instead).
    */
  private def aucOracle(slice: Option[String]): String = {
    val gSel = slice.map(c => s"$c, ").getOrElse("")
    val part = slice.map(c => s"PARTITION BY $c ").getOrElse("")
    val whole = slice.map(c => s"PARTITION BY $c").getOrElse("")
    val grpBy = slice.map(c => s"GROUP BY $c ORDER BY $c").getOrElse("")
    val gGrp = if (slice.isEmpty) "GROUP BY 1" else "GROUP BY 1, 2"
    s"""WITH g AS (
      | SELECT ${gSel}CAST(n_chars AS DOUBLE) AS s,
      |  sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS p,
      |  sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)::BIGINT AS n
      | FROM documents
      | WHERE n_chars IS NOT NULL AND lang IS NOT NULL $gGrp),
      |c AS (
      | SELECT ${gSel}p, n,
      |  COALESCE(sum(p) OVER (${part}ORDER BY s
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cp,
      |  COALESCE(sum(n) OVER (${part}ORDER BY s
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cn,
      |  sum(p) OVER ($whole) AS bigp, sum(n) OVER ($whole) AS bign
      | FROM g)
      |SELECT ${gSel}max(bigp)::BIGINT AS n_pos, max(bign)::BIGINT AS n_neg,
      | count(*)::BIGINT AS n_thresholds,
      | round(CASE WHEN max(bigp) > 0 AND max(bign) > 0 THEN
      |   (sum(CAST(p AS DOUBLE) * cn) + sum(CAST(p AS DOUBLE) * n) / 2)
      |    / (CAST(max(bigp) AS DOUBLE) * max(bign)) END, 6) AS roc_auc,
      | round(CASE WHEN max(bigp) > 0 THEN
      |   sum((CAST(p AS DOUBLE) / bigp)
      |     * (CAST(bigp - cp AS DOUBLE) / ((bigp - cp) + (bign - cn)))) END, 6)
      |   AS pr_auc
      |FROM c $grpBy""".stripMargin
  }

  /** q226's unrolled MM iterations (w0 → wN): each rK computes
    * raw_i = W_i / Σ_j n_ij/(s_i + s_j) from w(K−1); each wK
    * renormalizes to sum 1 — the exact fixed-iteration arithmetic
    * [[graft.operators.Stats.bradleyTerry]] runs on the driver.
    */
  private def btIterationCtes(iters: Int): String =
    (1 to iters).map { k =>
      // MATERIALIZED: each step references its predecessor twice plus a
      // scalar-subquery sum — left inlined, the chain re-expands the
      // whole upstream pipeline ~3^k times and the oracle never returns
      s"""r$k AS MATERIALIZED (
        | SELECT sym.i AS i,
        |  COALESCE(wins.wins, 0) / sum(sym.nij / (si.s + sj.s)) AS raw
        | FROM sym
        | JOIN w${k - 1} si ON sym.i = si.i
        | JOIN w${k - 1} sj ON sym.j = sj.i
        | LEFT JOIN wins ON sym.i = wins.i
        | GROUP BY sym.i, wins.wins),
        |w$k AS MATERIALIZED (
        | SELECT i, raw / (SELECT sum(raw) FROM r$k) AS s FROM r$k)""".stripMargin
    }.mkString(",\n")

  /** The q211/q212 TWO-reference pair CTEs: tokenized docs, lead-1 and
    * lead-2 references within the source, rows lacking two references
    * dropped (mirrors [[multiRefPairs]]).
    */
  private def multiRefPairCtes: String =
    """d AS (
      | SELECT doc_id, source,
      |  list_filter(string_split(lower(trim(text)), ' '), t -> t <> '') AS toks
      | FROM documents),
      |p AS (
      | SELECT doc_id AS cand_id, toks AS ct,
      |  lead(toks, 1) OVER w AS r1, lead(toks, 2) OVER w AS r2
      | FROM d WINDOW w AS (PARTITION BY source ORDER BY doc_id)),
      |pp AS (SELECT * FROM p WHERE r2 IS NOT NULL)""".stripMargin

  /** q198's oracle minus the final ORDER BY — composable as a CTE body
    * (the q208 rollup wraps all four per-pair metric oracles).
    */
  private def bleuPairOracle: String =
    s"""WITH $ngramClipCtes,
        |m AS (
        | SELECT t.cand_id,
        |  max(CASE WHEN t.n = 1 THEN t.c_tot END) AS c_len,
        |  max(CASE WHEN t.n = 1 THEN t.r_tot END) AS r_len,
        |  max(CASE WHEN t.n = 1 THEN COALESCE(cl.clipped, 0) END) AS m1,
        |  max(CASE WHEN t.n = 2 THEN COALESCE(cl.clipped, 0) END) AS m2,
        |  max(CASE WHEN t.n = 3 THEN COALESCE(cl.clipped, 0) END) AS m3,
        |  max(CASE WHEN t.n = 4 THEN COALESCE(cl.clipped, 0) END) AS m4,
        |  max(CASE WHEN t.n = 2 THEN t.c_tot END) AS ct2,
        |  max(CASE WHEN t.n = 3 THEN t.c_tot END) AS ct3,
        |  max(CASE WHEN t.n = 4 THEN t.c_tot END) AS ct4
        | FROM tot t LEFT JOIN cl ON t.cand_id = cl.cand_id AND t.n = cl.n
        | GROUP BY 1),
        |f AS (
        | SELECT pp.ref_id, m.*,
        |  CASE WHEN m.c_len = 0 THEN 0.0
        |       WHEN m.c_len > m.r_len THEN 1.0
        |       ELSE exp(1.0 - CAST(m.r_len AS DOUBLE) / m.c_len) END AS bp
        | FROM m JOIN pp ON m.cand_id = pp.cand_id)
        |SELECT cand_id, ref_id,
        | CAST(c_len AS BIGINT) AS c_len, CAST(r_len AS BIGINT) AS r_len,
        | CAST(m1 AS BIGINT) AS m1, CAST(m2 AS BIGINT) AS m2,
        | CAST(m3 AS BIGINT) AS m3, CAST(m4 AS BIGINT) AS m4,
        | round(bp, 6) AS bp,
        | round(CASE WHEN c_len = 0 OR m1 = 0 THEN 0.0
        |   ELSE bp * exp(ln(CAST(m1 AS DOUBLE) / c_len) / 4
        |               + ln(CAST(m2 + 1 AS DOUBLE) / (ct2 + 1)) / 4
        |               + ln(CAST(m3 + 1 AS DOUBLE) / (ct3 + 1)) / 4
        |               + ln(CAST(m4 + 1 AS DOUBLE) / (ct4 + 1)) / 4) END, 6) AS bleu
    |FROM f""".stripMargin

  /** q205's oracle minus the final ORDER BY. */
  private def chrfPairOracle: String =
    s"""WITH $chrClipCtes,
        |m AS (
        | SELECT t.cand_id,
        |  max(CASE WHEN t.n = 1 THEN t.c_tot END) AS c_chars,
        |  max(CASE WHEN t.n = 1 THEN t.r_tot END) AS r_chars,
        |  (((((max(CASE WHEN t.n = 1 THEN p END) + max(CASE WHEN t.n = 2 THEN p END))
        |    + max(CASE WHEN t.n = 3 THEN p END)) + max(CASE WHEN t.n = 4 THEN p END))
        |    + max(CASE WHEN t.n = 5 THEN p END)) + max(CASE WHEN t.n = 6 THEN p END)) / 6.0 AS chr_p,
        |  (((((max(CASE WHEN t.n = 1 THEN r END) + max(CASE WHEN t.n = 2 THEN r END))
        |    + max(CASE WHEN t.n = 3 THEN r END)) + max(CASE WHEN t.n = 4 THEN r END))
        |    + max(CASE WHEN t.n = 5 THEN r END)) + max(CASE WHEN t.n = 6 THEN r END)) / 6.0 AS chr_r
        | FROM (
        |  SELECT t.cand_id, t.n, t.c_tot, t.r_tot,
        |   CASE WHEN t.c_tot = 0 THEN 0.0
        |        ELSE CAST(COALESCE(cl.clipped, 0) AS DOUBLE) / t.c_tot END AS p,
        |   CASE WHEN t.r_tot = 0 THEN 0.0
        |        ELSE CAST(COALESCE(cl.clipped, 0) AS DOUBLE) / t.r_tot END AS r
        |  FROM tot t LEFT JOIN cl ON t.cand_id = cl.cand_id AND t.n = cl.n) t
        | GROUP BY 1)
        |SELECT m.cand_id, pp.ref_id,
        | CAST(c_chars AS BIGINT) AS c_chars, CAST(r_chars AS BIGINT) AS r_chars,
        | round(chr_p, 6) AS chr_p, round(chr_r, 6) AS chr_r,
        | round(CASE WHEN chr_p + chr_r = 0.0 THEN 0.0
        |   ELSE 5.0 * chr_p * chr_r / (4.0 * chr_p + chr_r) END, 6) AS chrf
        |FROM m JOIN pp ON m.cand_id = pp.cand_id""".stripMargin

  /** q206's oracle minus the final ORDER BY. */
  private def rougeLPairOracle: String =
    """WITH RECURSIVE d AS (
        | SELECT doc_id, source,
        |  list_filter(string_split(lower(trim(text)), ' '), t -> t <> '') AS toks
        | FROM documents),
        |p AS (
        | SELECT doc_id AS cand_id, toks AS ct,
        |  lead(doc_id) OVER w AS ref_id, lead(toks) OVER w AS rt
        | FROM d WINDOW w AS (PARTITION BY source ORDER BY doc_id)),
        |pp AS (SELECT cand_id, ref_id, ct, rt, len(ct) AS n, len(rt) AS m
        |       FROM p WHERE ref_id IS NOT NULL),
        |rec AS (
        | SELECT cand_id, n, m, ct, rt, CAST(1 AS BIGINT) AS d,
        |  list_transform(range(greatest(0, 1 - m), least(n, 1) + 1), x -> CAST(0 AS BIGINT)) AS cur,
        |  [CAST(0 AS BIGINT)] AS prev
        | FROM pp WHERE n + m >= 1
        | UNION ALL
        | SELECT cand_id, n, m, ct, rt, d + 1,
        |  list_transform(range(greatest(0, d + 1 - m), least(n, d + 1) + 1),
        |   i -> CASE
        |     WHEN i = 0 OR d + 1 - i = 0 THEN CAST(0 AS BIGINT)
        |     WHEN ct[CAST(i AS INT)] = rt[CAST(d + 1 - i AS INT)]
        |       THEN prev[CAST(i - 1 - greatest(0, d - 1 - m) + 1 AS INT)] + 1
        |     ELSE greatest(
        |       cur[CAST(i - 1 - greatest(0, d - m) + 1 AS INT)],
        |       cur[CAST(i - greatest(0, d - m) + 1 AS INT)]) END) AS cur,
        |  cur AS prev
        | FROM rec WHERE d < n + m),
        |lcs AS (SELECT cand_id, cur[1] AS lcs FROM rec WHERE d = n + m),
        |mt AS (
        | SELECT pp.cand_id, pp.ref_id,
        |  CAST(pp.n AS BIGINT) AS c_len, CAST(pp.m AS BIGINT) AS r_len,
        |  CAST(COALESCE(l.lcs, 0) AS BIGINT) AS lcs,
        |  CASE WHEN pp.n = 0 THEN 0.0
        |       ELSE CAST(COALESCE(l.lcs, 0) AS DOUBLE) / pp.n END AS p,
        |  CASE WHEN pp.m = 0 THEN 0.0
        |       ELSE CAST(COALESCE(l.lcs, 0) AS DOUBLE) / pp.m END AS r
        | FROM pp LEFT JOIN lcs l ON pp.cand_id = l.cand_id)
        |SELECT cand_id, ref_id, c_len, r_len, lcs,
        | round(p, 6) AS "precision", round(r, 6) AS recall,
        | round(CASE WHEN p + r = 0.0 THEN 0.0
        |   ELSE 2.0 * p * r / (r + 1.0 * p) END, 6) AS rouge_l
    |FROM mt""".stripMargin

  /** q207's oracle minus the final ORDER BY. */
  private def werPairOracle: String =
    """WITH RECURSIVE d AS (
        | SELECT doc_id, source,
        |  list_filter(string_split(lower(trim(text)), ' '), t -> t <> '') AS toks
        | FROM documents),
        |p AS (
        | SELECT doc_id AS cand_id, toks AS ct,
        |  lead(doc_id) OVER w AS ref_id, lead(toks) OVER w AS rt
        | FROM d WINDOW w AS (PARTITION BY source ORDER BY doc_id)),
        |pp AS (SELECT cand_id, ref_id, ct, rt, len(ct) AS n, len(rt) AS m
        |       FROM p WHERE ref_id IS NOT NULL),
        |rec AS (
        | SELECT cand_id, n, m, ct, rt, CAST(1 AS BIGINT) AS d,
        |  list_transform(range(greatest(0, 1 - m), least(n, 1) + 1),
        |   i -> CASE WHEN i = 0 THEN CAST(1 AS BIGINT) ELSE CAST(i AS BIGINT) END) AS cur,
        |  [CAST(0 AS BIGINT)] AS prev
        | FROM pp WHERE n + m >= 1
        | UNION ALL
        | SELECT cand_id, n, m, ct, rt, d + 1,
        |  list_transform(range(greatest(0, d + 1 - m), least(n, d + 1) + 1),
        |   i -> CASE
        |     WHEN i = 0 THEN CAST(d + 1 AS BIGINT)
        |     WHEN d + 1 - i = 0 THEN CAST(i AS BIGINT)
        |     ELSE least(
        |       prev[CAST(i - 1 - greatest(0, d - 1 - m) + 1 AS INT)]
        |         + (CASE WHEN ct[CAST(i AS INT)] = rt[CAST(d + 1 - i AS INT)] THEN 0 ELSE 1 END),
        |       least(
        |         cur[CAST(i - 1 - greatest(0, d - m) + 1 AS INT)] + 1,
        |         cur[CAST(i - greatest(0, d - m) + 1 AS INT)] + 1)) END) AS cur,
        |  cur AS prev
        | FROM rec WHERE d < n + m),
        |ed AS (SELECT cand_id, cur[1] AS edits FROM rec WHERE d = n + m),
        |mt AS (
        | SELECT pp.cand_id, pp.ref_id,
        |  CAST(pp.n AS BIGINT) AS h_len, CAST(pp.m AS BIGINT) AS r_len,
        |  CAST(CASE WHEN pp.n + pp.m = 0 THEN 0 ELSE e.edits END AS BIGINT) AS edits
        | FROM pp LEFT JOIN ed e ON pp.cand_id = e.cand_id)
        |SELECT cand_id, ref_id, h_len, r_len, edits,
        | round(CASE WHEN r_len > 0 THEN CAST(edits AS DOUBLE) / r_len
        |   WHEN h_len = 0 THEN 0.0 ELSE 1.0 END, 6) AS wer
    |FROM mt""".stripMargin

  /** The q205 CTE block: adjacent pairs over CHARACTER sequences
    * (whitespace stripped — chars therefore cannot contain ' ', so
    * space-joined gram keys are unambiguous) and per-order clipped
    * char-n-gram counts for n = 1..6.
    */
  private def chrClipCtes: String =
    """d AS (
      | SELECT doc_id, source,
      |  regexp_replace(lower(trim(text)), '\s+', '', 'g') AS cs
      | FROM documents),
      |dt AS (
      | SELECT doc_id, source,
      |  list_transform(range(1, length(cs) + 1), i -> substring(cs, CAST(i AS INT), 1)) AS toks
      | FROM d),
      |p AS (
      | SELECT doc_id AS cand_id, source, toks AS ct,
      |  lead(doc_id) OVER w AS ref_id, lead(toks) OVER w AS rt
      | FROM dt WINDOW w AS (PARTITION BY source ORDER BY doc_id)),
      |pp AS (SELECT * FROM p WHERE ref_id IS NOT NULL),
      |ns AS (SELECT unnest([1, 2, 3, 4, 5, 6]) AS n),
      |tot AS (
      | SELECT cand_id, n,
      |  greatest(len(ct) - n + 1, 0) AS c_tot,
      |  greatest(len(rt) - n + 1, 0) AS r_tot
      | FROM pp, ns),
      |cg AS (
      | SELECT cand_id, n, g, count(*) AS cc FROM (
      |  SELECT cand_id, n, unnest(list_transform(range(greatest(len(ct) - n + 1, 0)),
      |   i -> array_to_string(ct[i+1 : i+n], ' '))) AS g
      |  FROM pp, ns)
      | GROUP BY 1, 2, 3),
      |rg AS (
      | SELECT cand_id, n, g, count(*) AS rc FROM (
      |  SELECT cand_id, n, unnest(list_transform(range(greatest(len(rt) - n + 1, 0)),
      |   i -> array_to_string(rt[i+1 : i+n], ' '))) AS g
      |  FROM pp, ns)
      | GROUP BY 1, 2, 3),
      |cl AS (
      | SELECT cand_id, n, COALESCE(sum(least(cc, COALESCE(rc, 0))), 0) AS clipped
      | FROM cg LEFT JOIN rg USING (cand_id, n, g)
      | GROUP BY 1, 2)""".stripMargin

  /** q163/q202 shared oracle: every dHash bit reconstructed from the
    * closed-form pixel generator — integer luma, cross-multiplied cell
    * comparison, hex nibbles assembled most-significant-first. Valid
    * for ANY lossless container of the same logical pixels.
    */
  private def dhashClosedFormOracle: String =
    s"""WITH ${dhashBitCtes("", 0)},
       |nib AS (SELECT media_id, (cy * 8 + cx) // 4 AS ni,
       |         CAST(sum(bit << ((cy * 8 + cx) % 4)) AS INT) AS v
       |        FROM bits GROUP BY 1, 2)
       |SELECT media_id,
       | string_agg(substr('0123456789abcdef', v + 1, 1), '' ORDER BY ni DESC) AS dhash
       |FROM nib GROUP BY media_id ORDER BY media_id""".stripMargin

  /** q134/q204 shared oracle: every 4×4 cell mean recomputed from the
    * closed-form pixel bytes. Valid for any lossless container of the
    * same logical pixels.
    */
  private def poolClosedFormOracle: String =
    """WITH m AS (
        | SELECT r.i AS media_id, CAST(16 + (r.i % 6) * 8 AS INT) AS w,
        |  CAST(16 + (r.i % 5) * 8 AS INT) AS h
        | FROM range(300) r(i) WHERE r.i % 3 = 0),
        |px AS (
        | SELECT m.media_id, (xx.x * 4) // m.w AS cell_x, (yy.y * 4) // m.h AS cell_y,
        |  (m.media_id * 31 + 7 * (yy.y * m.w * 3 + xx.x * 3 + 2)) % 251 AS rb,
        |  (m.media_id * 31 + 7 * (yy.y * m.w * 3 + xx.x * 3 + 1)) % 251 AS gb,
        |  (m.media_id * 31 + 7 * (yy.y * m.w * 3 + xx.x * 3)) % 251 AS bb
        | FROM m, unnest(range(0, m.w)) xx(x), unnest(range(0, m.h)) yy(y))
        |SELECT media_id, CAST(cell_x AS INT) AS cell_x, CAST(cell_y AS INT) AS cell_y,
        | round(avg(rb), 4) AS r_mean, round(avg(gb), 4) AS g_mean,
        | round(avg(bb), 4) AS b_mean
        |FROM px
        |GROUP BY 1, 2, 3
        |ORDER BY media_id, cell_y, cell_x""".stripMargin

  /** Shared CTE block for the q198/q199 oracles: adjacent-pair harness
    * (lead over doc_id within source — exactly
    * [[graft.operators.TextEval.adjacentPairs]]) and per-order clipped
    * n-gram counts for n = 1..4 (grams keyed by space-joined token
    * slices — unambiguous in the oracle because the tokens come from a
    * split on ' '; the engine's kernel uses length-prefixed keys for
    * the same sequence-equality semantics on arbitrary tokens).
    */
  private def ngramClipCtes: String =
    """d AS (
      | SELECT doc_id, source,
      |  list_filter(string_split(lower(trim(text)), ' '), t -> t <> '') AS toks
      | FROM documents),
      |p AS (
      | SELECT doc_id AS cand_id, source, toks AS ct,
      |  lead(doc_id) OVER w AS ref_id, lead(toks) OVER w AS rt
      | FROM d WINDOW w AS (PARTITION BY source ORDER BY doc_id)),
      |pp AS (SELECT * FROM p WHERE ref_id IS NOT NULL),
      |ns AS (SELECT unnest([1, 2, 3, 4]) AS n),
      |tot AS (
      | SELECT cand_id, n,
      |  greatest(len(ct) - n + 1, 0) AS c_tot,
      |  greatest(len(rt) - n + 1, 0) AS r_tot
      | FROM pp, ns),
      |cg AS (
      | SELECT cand_id, n, g, count(*) AS cc FROM (
      |  SELECT cand_id, n, unnest(list_transform(range(greatest(len(ct) - n + 1, 0)),
      |   i -> array_to_string(ct[i+1 : i+n], ' '))) AS g
      |  FROM pp, ns)
      | GROUP BY 1, 2, 3),
      |rg AS (
      | SELECT cand_id, n, g, count(*) AS rc FROM (
      |  SELECT cand_id, n, unnest(list_transform(range(greatest(len(rt) - n + 1, 0)),
      |   i -> array_to_string(rt[i+1 : i+n], ' '))) AS g
      |  FROM pp, ns)
      | GROUP BY 1, 2, 3),
      |cl AS (
      | SELECT cand_id, n, COALESCE(sum(least(cc, COALESCE(rc, 0))), 0) AS clipped
      | FROM cg LEFT JOIN rg USING (cand_id, n, g)
      | GROUP BY 1, 2)""".stripMargin


  /** The q163/q164 oracle building block: CTEs `<p>m / <p>px / <p>cells
    * / <p>bits` reconstructing the 9×8 dHash bit grid from the
    * synthetic-BMP pixel generator with channel bytes shifted by
    * `delta` (clamped at 255) — all integer arithmetic.
    */
  private def dhashBitCtes(p: String, delta: Int): String =
    s"""${p}m AS (
       | SELECT r.i AS media_id, CAST(16 + (r.i % 6) * 8 AS INT) AS w,
       |  CAST(16 + (r.i % 5) * 8 AS INT) AS h
       | FROM range(300) r(i) WHERE r.i % 3 = 0),
       |${p}px AS (
       | SELECT m.media_id, (xx.x * 9) // m.w AS cx, (yy.y * 8) // m.h AS cy,
       |    299 * least((m.media_id * 31 + 7 * (yy.y * m.w * 3 + xx.x * 3 + 2)) % 251 + $delta, 255)
       |  + 587 * least((m.media_id * 31 + 7 * (yy.y * m.w * 3 + xx.x * 3 + 1)) % 251 + $delta, 255)
       |  + 114 * least((m.media_id * 31 + 7 * (yy.y * m.w * 3 + xx.x * 3)) % 251 + $delta, 255) AS luma
       | FROM ${p}m m, unnest(range(0, m.w)) xx(x), unnest(range(0, m.h)) yy(y)),
       |${p}cells AS (
       | SELECT media_id, cx, cy, CAST(sum(luma) AS BIGINT) AS s, count(*) AS n
       | FROM ${p}px GROUP BY 1, 2, 3),
       |${p}bits AS (
       | SELECT a.media_id, a.cy, a.cx,
       |  CASE WHEN b.s * a.n > a.s * b.n THEN 1 ELSE 0 END AS bit
       | FROM ${p}cells a JOIN ${p}cells b
       |   ON a.media_id = b.media_id AND a.cy = b.cy AND b.cx = a.cx + 1
       | WHERE a.cx < 8)""".stripMargin

  /** q167's exact-ranking CTE body over an optional list slice. */
  private def matryoshkaRankSql(sliceExpr: String): String =
    s"""SELECT q.vec_id AS query_id, c.vec_id AS neighbour_id,
       |  row_number() OVER (PARTITION BY q.vec_id
       |    ORDER BY list_cosine_similarity(q.e$sliceExpr, c.e$sliceExpr) DESC,
       |             c.vec_id ASC) AS rn
       | FROM qf q JOIN cf c ON q.vec_id <> c.vec_id""".stripMargin

  /** Shared brute-force oracle for q23 (exact) and q24 (MinHash LSH +
    * exact verify): both must produce the identical pair set.
    */
  /** Brute-force token-set Jaccard pairs within lang blocks at a given
    * threshold — the shared subquery behind the q23/q24 oracle and the
    * q49 connected-components oracle.
    */
  /** Brute-force bigram-shingle Jaccard pairs at threshold 0.5 — the
    * shared oracle for q44 (autoBanding) and q114 (selectiveBanding):
    * banding must never change the verified pair set.
    */
  /** q188's oracle: the five greedy MMR argmax rounds unrolled as SQL
    * CTEs — same λ literal, same IEEE (1 − λ), same 6-dp cosine / 9-dp
    * score quantization, same doc-id tie-break as the engine.
    */
  private val mmrOracle: String = {
    val lam = "CAST(0.7 AS DOUBLE)"
    val mu = s"(1 - $lam)"
    val head =
      s"""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
         |cand AS (SELECT qid, did, rel FROM (
         | SELECT q.vec_id AS qid, c.vec_id AS did,
         |  round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS rel,
         |  row_number() OVER (PARTITION BY q.vec_id
         |    ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
         |             c.vec_id ASC) AS rn
         | FROM q JOIN embeddings c ON q.vec_id <> c.vec_id) t WHERE rn <= 10),
         |sims AS (SELECT a.qid, a.did, b.did AS db,
         |  round(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6) AS sim
         | FROM cand a JOIN cand b ON a.qid = b.qid AND a.did <> b.did
         | JOIN embeddings ea ON ea.vec_id = a.did
         | JOIN embeddings eb ON eb.vec_id = b.did),
         |p1 AS (SELECT qid, did, round($lam * rel - $mu * 0.0, 9) AS score,
         |  row_number() OVER (PARTITION BY qid
         |    ORDER BY round($lam * rel - $mu * 0.0, 9) DESC, did ASC) AS rn FROM cand),
         |s1 AS (SELECT qid, did, 1 AS mmr_rank, score FROM p1 WHERE rn = 1),
         |sel1 AS (SELECT qid, did FROM s1)""".stripMargin
    val rounds = (2 to 5).map { i =>
      s"""r$i AS (SELECT c.* FROM cand c WHERE NOT EXISTS (
         |  SELECT 1 FROM sel${i - 1} s WHERE s.qid = c.qid AND s.did = c.did)),
         |pen$i AS (SELECT s.qid, s.did, max(s.sim) AS pen
         |  FROM sims s JOIN sel${i - 1} x ON s.qid = x.qid AND s.db = x.did
         |  GROUP BY 1, 2),
         |p$i AS (SELECT r.qid, r.did,
         |  round($lam * r.rel - $mu * coalesce(p.pen, 0.0), 9) AS score,
         |  row_number() OVER (PARTITION BY r.qid
         |    ORDER BY round($lam * r.rel - $mu * coalesce(p.pen, 0.0), 9) DESC,
         |             r.did ASC) AS rn
         |  FROM r$i r LEFT JOIN pen$i p ON r.qid = p.qid AND r.did = p.did),
         |s$i AS (SELECT qid, did, $i AS mmr_rank, score FROM p$i WHERE rn = 1),
         |sel$i AS (SELECT qid, did FROM sel${i - 1} UNION ALL SELECT qid, did FROM s$i)""".stripMargin
    }.mkString(",\n", ",\n", "")
    val tail =
      """
        |SELECT qid AS query_id, CAST(mmr_rank AS BIGINT) AS mmr_rank,
        | did AS doc_id, score AS mmr_score
        |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL
        |      SELECT * FROM s3 UNION ALL SELECT * FROM s4 UNION ALL
        |      SELECT * FROM s5) u
        |ORDER BY query_id, mmr_rank""".stripMargin
    head + rounds + tail
  }

  /** Shared CTE prefix for the q174/q175 oracles: the 2-gram shingle
    * inverted index (q44's oracle shape) extended with both directional
    * containment ratios, `qual` = pairs where either direction ≥ 0.4.
    */
  private val containmentPairsSql: String =
    """WITH g AS (
      | SELECT doc_id, lang,
      |  list_distinct(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS grams
      | FROM (SELECT doc_id, lang, string_split(lower(trim(text)), ' ') AS toks FROM documents) t
      |), tok AS (SELECT doc_id, lang, unnest(grams) AS g2 FROM g),
      |sz AS (SELECT doc_id, len(grams) AS n FROM g),
      |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      |          FROM tok a JOIN tok b ON a.g2 = b.g2 AND a.lang = b.lang AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |qual AS (
      | SELECT id_a, id_b, shared, sa.n AS na, sb.n AS nb,
      |  shared * 1.0 / sa.n AS ca, shared * 1.0 / sb.n AS cb
      | FROM pairs JOIN sz sa ON id_a = sa.doc_id JOIN sz sb ON id_b = sb.doc_id
      | WHERE greatest(shared * 1.0 / sa.n, shared * 1.0 / sb.n) >= 0.4)""".stripMargin

  private val ngramJaccardOracle: String =
    """WITH g AS (
      | SELECT doc_id, lang,
      |  list_distinct(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS grams
      | FROM (SELECT doc_id, lang, string_split(lower(trim(text)), ' ') AS toks FROM documents) t
      |), tok AS (SELECT doc_id, lang, unnest(grams) AS g2 FROM g),
      |sz AS (SELECT doc_id, len(grams) AS n FROM g),
      |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      |          FROM tok a JOIN tok b ON a.g2 = b.g2 AND a.lang = b.lang AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT id_a, id_b, round(shared * 1.0 / (sa.n + sb.n - shared), 6) AS jaccard
      |FROM pairs
      |JOIN sz sa ON id_a = sa.doc_id
      |JOIN sz sb ON id_b = sb.doc_id
      |WHERE shared * 1.0 / (sa.n + sb.n - shared) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin

  private def jaccardPairsSql(threshold: String): String =
    s"""SELECT id_a, id_b, shared * 1.0 / (na + nb - shared) AS jaccard
       |FROM (
       | SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
       | FROM (SELECT doc_id, lang, unnest(list_distinct(string_split(lower(trim(text)), ' '))) AS token FROM documents) a
       | JOIN (SELECT doc_id, lang, unnest(list_distinct(string_split(lower(trim(text)), ' '))) AS token FROM documents) b
       |   ON a.token = b.token AND a.lang = b.lang AND a.doc_id < b.doc_id
       | GROUP BY 1, 2) p
       |JOIN (SELECT doc_id, len(list_distinct(string_split(lower(trim(text)), ' '))) AS na FROM documents) sa ON p.id_a = sa.doc_id
       |JOIN (SELECT doc_id, len(list_distinct(string_split(lower(trim(text)), ' '))) AS nb FROM documents) sb ON p.id_b = sb.doc_id
       |WHERE shared * 1.0 / (na + nb - shared) >= $threshold""".stripMargin

  private val jaccardOracle: String =
    s"""SELECT id_a, id_b, round(jaccard, 6) AS jaccard
       |FROM (${jaccardPairsSql("0.95")}) pairs
       |ORDER BY id_a, id_b""".stripMargin
}
