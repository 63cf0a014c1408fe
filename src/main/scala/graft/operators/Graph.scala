package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative link-analysis over edge lists — centrality for corpus
  * graphs a training-data pipeline actually builds (near-duplicate
  * graphs, citation/link graphs, entity co-occurrence). No reference
  * implementation (the pandas ETL has no graph surface, SURVEY.md §2.12);
  * the semantics are the classic damped PageRank (Page et al. 1999)
  * by power iteration.
  *
  * Scale shape (the 100 TB contract): each iteration is two shuffle
  * joins keyed on node id — edge ⨝ rank on `src`, contribution sum on
  * `dst` — plus a left join back to the node spine, all distributed
  * hash aggregations with map-side combine. The rank table is one row
  * per NODE (never per edge) and the per-iteration lineage is truncated
  * with an eager `localCheckpoint` (the [[Components]] pattern) so the
  * plan and its stage DAG stay constant-size regardless of iteration
  * count. Nothing node- or edge-sized ever reaches the driver.
  */
object Graph {

  /** [[triangleCounts]] broadcasts the oriented adjacency table while
    * the graph has at most this many edges (total adjacency payload is
    * one entry per edge — ~130 MB of longs plus row overhead at the
    * cutoff); larger graphs fall back to keyed shuffle joins.
    */
  val BroadcastAdjacencyEdges: Long = 8000000L

  /** The iterative operators ([[pageRank]], [[hits]],
    * [[labelPropagation]], [[kCore]]) broadcast their node-sized
    * per-iteration state (ranks / scores / labels / survivors) while
    * the graph has at most this many nodes — ~200 MB of id+score rows
    * at the cutoff — so no iteration ever shuffles the edge list
    * (guide §2.4: a broadcast join replaces the shuffle of the large
    * side). Larger graphs fall back to the keyed shuffle joins, which
    * compute the identical result.
    */
  val BroadcastNodeState: Long = 4000000L

  /** Damped PageRank over a DIRECTED edge list, fixed iteration count.
    *
    * `pr(id) = (1-d)/N + d * Σ_{src→id} pr(src)/outdeg(src)` from a
    * uniform `1/N` start, N = |distinct src ∪ dst|. Duplicate edges are
    * collapsed first (one edge = one vote, the convention that makes
    * ranks independent of upstream fan-out multiplicity). Dangling
    * nodes (out-degree 0) absorb rank — their mass is NOT redistributed,
    * the simple variant; callers who need conservation symmetrize the
    * edge list (undirected graphs have no dangling nodes by
    * construction, which is what the q113 query does).
    *
    * A fixed iteration count (not a convergence test) keeps the output
    * a pure function of (edges, iterations, damping) — oracle-checkable
    * by unrolling the same joins in SQL.
    *
    * Output: (id, pr), one row per node.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1), got $damping")
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .persist()
    graft.Caches.track(e)
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("__deg"))
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct()
      .persist()
    graft.Caches.track(nodes)
    val n = nodes.count()
    if (n == 0) {
      // empty graph: empty (id, pr) result with the right schema
      return nodes.withColumn("pr", lit(0.0))
    }
    val teleport = (1.0 - damping) / n
    // degree is attached to the edge list ONCE (it used to be re-joined
    // every iteration — one whole extra edge-sized join per round); the
    // division stays pr/__deg with the raw long count, so the per-edge
    // contribution doubles are bit-identical to the old plan's
    val eDeg = e.join(outDeg, "src").persist()
    graft.Caches.track(eDeg)
    // node-sized state broadcasts below the cutoff: the per-iteration
    // joins become map-side and the edge list is never shuffled
    val attach: DataFrame => DataFrame =
      if (n <= BroadcastNodeState) df => broadcast(df) else identity

    // curCk backs `ranks`; each round's eager checkpoint both computes
    // the iteration and truncates lineage, then releases the previous one
    var curCk = nodes.withColumn("pr", lit(1.0 / n)).localCheckpoint(true)
    var ranks = curCk
    for (_ <- 1 to iterations) {
      val contribs = eDeg
        .join(attach(ranks.withColumnRenamed("id", "src")), "src")
        .select(col("dst").as("id"), (col("pr") / col("__deg")).as("__c"))
        .groupBy("id")
        .agg(sum(col("__c")).as("__in"))
      val next = nodes
        .join(attach(contribs), Seq("id"), "left")
        .select(col("id"),
          (lit(teleport) + lit(damping) * coalesce(col("__in"), lit(0.0)))
            .as("pr"))
        .localCheckpoint(true)
      curCk.unpersist(blocking = false)
      curCk = next
      ranks = next
    }
    graft.Caches.track(curCk)
    ranks
  }

  /** HITS hubs-and-authorities (Kleinberg, JACM 1999) over a DIRECTED
    * edge list, fixed iteration count — the link-analysis complement
    * of [[pageRank]] for bipartite-flavored crawl graphs (hub pages
    * pointing at authoritative hosts, parts "endorsing" suppliers):
    * each iteration `auth(v) = Σ_{u→v} hub(u)` then
    * `hub(u) = Σ_{u→v} auth(v)`, each L1-normalized to sum 1 (the SUM
    * norm keeps every step a join + aggregate + one scalar divide an
    * external engine restates verbatim; the classic L2 adds only a
    * sqrt that changes no ordering). Duplicate edges collapse first
    * (one edge = one endorsement, the [[pageRank]] convention); hubs
    * start uniform at 1∕N. Sources with no in-links hold authority 0,
    * sinks with no out-links hub 0 — both stay in the output.
    *
    * Scale shape mirrors [[pageRank]]: per half-iteration one edge ⨝
    * score join, a node-keyed sum with map-side combine, a 1-row total
    * broadcast back, and eager localCheckpoint lineage cuts; score
    * state is one row per node.
    *
    * Output: (id, auth, hub), one row per node.
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iterations: Int): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .persist()
    graft.Caches.track(e)
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct()
      .persist()
    graft.Caches.track(nodes)
    val n = nodes.count()
    if (n == 0) {
      return nodes.withColumn("auth", lit(0.0)).withColumn("hub", lit(0.0))
    }

    // node-sized score tables broadcast below the cutoff (the
    // [[pageRank]] dispatch): both per-half-step joins go map-side and
    // the edge list is never shuffled
    val attach: DataFrame => DataFrame =
      if (n <= BroadcastNodeState) df => broadcast(df) else identity

    // one L1-normalized propagation half-step: scores flow across the
    // edge list from `from` endpoints onto `onto` endpoints. `raw` is
    // persisted for the step: it feeds both the 1-row total and the
    // node join, and used to be recomputed (a whole extra edge pass)
    // for each.
    def halfStep(scores: DataFrame, scoreCol: String,
                 from: String, onto: String, outCol: String): DataFrame = {
      val raw = e
        .join(attach(scores.select(col("id").as(from), col(scoreCol))), from)
        .groupBy(col(onto).as("id"))
        .agg(sum(col(scoreCol)).as("__raw"))
        .persist()
      graft.Caches.track(raw)
      val tot = raw.agg(sum(col("__raw")).as("__tot"))
      nodes
        .join(attach(raw), Seq("id"), "left")
        .crossJoin(broadcast(tot))
        .select(col("id"),
          when(col("__tot") > 0, coalesce(col("__raw"), lit(0.0)) / col("__tot"))
            .otherwise(lit(0.0)).as(outCol))
    }

    var curCk = nodes
      .withColumn("auth", lit(0.0))
      .withColumn("hub", lit(1.0 / n))
      .localCheckpoint(true)
    var scores = curCk
    for (_ <- 1 to iterations) {
      val auth = halfStep(scores.select(col("id"), col("hub")), "hub",
        "src", "dst", "auth")
      val hub = halfStep(auth, "auth", "dst", "src", "hub")
      val next = auth.join(hub, "id").localCheckpoint(true)
      curCk.unpersist(blocking = false)
      curCk = next
      scores = next
    }
    graft.Caches.track(curCk)
    scores.select(col("id"), col("auth"), col("hub"))
  }

  /** Synchronous label propagation (Raghavan, Albert & Kumara 2007) —
    * community detection over the same corpus graphs: every node
    * starts labeled with its own id; each iteration it adopts the
    * label most frequent among its out-neighbours (callers symmetrize
    * for undirected semantics, as with [[pageRank]]), ties breaking to
    * the SMALLEST label and isolated nodes keeping theirs. The
    * synchronous schedule + deterministic tie-break make the output a
    * pure function of (edges, iterations) — oracle-checkable by
    * unrolling, where the classic asynchronous variant is
    * order-dependent.
    *
    * Scale shape mirrors [[pageRank]]: per iteration one edge ⨝ label
    * join, an (id, label)-keyed count with map-side combine, a
    * node-keyed window over the ≤ degree candidate labels per node,
    * and lineage truncation via eager localCheckpoint. Label state is
    * one row per node.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iterations: Int): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .persist()
    graft.Caches.track(e)
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct()
      .persist()
    graft.Caches.track(nodes)
    val n = nodes.count()
    // node-sized label state broadcasts below the cutoff (the
    // [[pageRank]] dispatch): the per-iteration joins go map-side and
    // the edge list is never shuffled
    val attach: DataFrame => DataFrame =
      if (n <= BroadcastNodeState) df => broadcast(df) else identity

    var curCk = nodes.withColumn("label", col("id")).localCheckpoint(true)
    var labels = curCk
    for (_ <- 1 to iterations) {
      val votes = e
        .join(attach(labels.withColumnRenamed("id", "dst")), "dst")
        .groupBy(col("src").as("id"), col("label"))
        .agg(count(lit(1)).as("__n"))
      // winner per node = most frequent label, ties to the SMALLEST —
      // exactly the old row_number-over-window's (__n desc, label asc)
      // rank-1 row, but as a map-side-combinable aggregate: min of
      // (-count, label) is lexicographically (count desc, label asc),
      // so the window's sort + single-partition-per-key pass is gone
      val winner = votes
        .groupBy("id")
        .agg(min(struct((-col("__n")).as("__negn"), col("label").as("__l")))
          .as("__w"))
        .select(col("id"), col("__w.__l").as("__new"))
      val next = nodes
        .join(attach(winner), Seq("id"), "left")
        .join(attach(labels.withColumnRenamed("label", "__old")), Seq("id"))
        .select(col("id"), coalesce(col("__new"), col("__old")).as("label"))
        .localCheckpoint(true)
      curCk.unpersist(blocking = false)
      curCk = next
      labels = next
    }
    graft.Caches.track(curCk)
    labels
  }

  /** Bounded k-core peeling (Matula–Beck): iteratively delete every
    * node of degree < k, restricting the edge set to survivors each
    * round — the standard dense-core extractor for corpus graphs
    * (link-spam cores, template families inside near-dup graphs,
    * community nuclei) and the complement of [[triangleCounts]]'
    * per-node cohesion. A FIXED round count (not a fixpoint test)
    * keeps the output a pure function of (edges, k, rounds) — the
    * [[pageRank]]/[[labelPropagation]] convention that makes it
    * oracle-checkable by unrolling; peeling is monotone, so `rounds`
    * ≥ the peel depth reaches the true k-core and extra rounds are
    * no-ops (spec'd).
    *
    * Scale shape: each round is one degree aggregation (map-side
    * combined) + two node-keyed semi-joins restricting the edge list;
    * state is the edge set itself, shrinking monotonically, with
    * lineage truncated per round by eager localCheckpoint. Output:
    * (id, degree) over the surviving subgraph — nodes that lost every
    * edge drop out with it.
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
            k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    def degrees(e: DataFrame) = e.select(col("a").as("id"))
      .unionByName(e.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    var e = edges
      .select(col(srcCol).as("u"), col(dstCol).as("v"))
      .where(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b"))
      .distinct()
      .localCheckpoint(true)
    // survivor sets are node-sized (≤ 2·edges, shrinking every round):
    // below the cutoff they broadcast, making both per-round semi-joins
    // map-side so the edge list is never shuffled (the [[pageRank]]
    // dispatch, decided once on the initial — largest — edge count)
    val attach: DataFrame => DataFrame =
      if (e.count() <= BroadcastNodeState) df => broadcast(df) else identity
    for (_ <- 1 to rounds) {
      // persisted: surv feeds BOTH semi-joins — without it the degree
      // aggregation runs twice per round (the two subtrees' exprIds
      // differ, so exchange reuse never matched them)
      val surv = degrees(e).filter(col("degree") >= k).select(col("id"))
        .persist()
      val next = e
        .join(attach(surv.withColumnRenamed("id", "a")), Seq("a"), "left_semi")
        .join(attach(surv.withColumnRenamed("id", "b")), Seq("b"), "left_semi")
        .localCheckpoint(true)
      e.unpersist(blocking = false)
      surv.unpersist(blocking = false)
      e = next
    }
    graft.Caches.track(e)
    degrees(e)
  }

  /** Per-node triangle counts + local clustering coefficient over an
    * UNDIRECTED graph (input edge list may carry either or both
    * directions, duplicates, and self-loops — all normalized away
    * first). Completes the corpus-graph family next to [[pageRank]],
    * [[labelPropagation]] and [[Components]]: triangle density is the
    * standard cohesion signal for near-duplicate clusters (a dedup
    * cluster that is also a near-clique is a template family; a
    * star is one viral doc) and for link-spam detection.
    *
    * Algorithm: degree-ordered edge orientation (Suri & Vassilvitskii,
    * WWW 2011 / Chiba–Nishizeki) + edge-iterator adjacency
    * intersection. Every undirected edge is directed from its lower to
    * its higher endpoint under the total order (degree, id), which
    * bounds every node's oriented OUT-degree by O(√m) regardless of
    * skew — a 10M-follower hub is always a neighbour-list ENTRY, never
    * the list owner. Oriented out-neighbour lists are then joined onto
    * both endpoints of each oriented edge (u, v) and intersected:
    * every common out-neighbour w closes the triangle {u, v, w},
    * found exactly once (u, v are its two lowest-order corners). Total
    * intersection work is the O(m^{3/2}) wedge bound, but — unlike the
    * naive wedge SELF-JOIN — no wedge-sized table is ever
    * materialized or shuffled: the big intermediates are edge-sized
    * rows carrying ≤ O(√m)-element arrays, the intersections run
    * inside the projection, and the only post-edge shuffles are
    * triangle-sized count aggregations with map-side combine. Nothing
    * graph-sized reaches the driver.
    *
    * Output: (id, degree, triangles, lcc), one row per node with
    * degree ≥ 1; `lcc` = 2·T/(d·(d−1)) (0.0 when d < 2), exact
    * double — callers round for presentation.
    */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // integral ids take the sorted-merge intersection kernel (adjacency
    // lists sorted once per node, per-edge closing is a two-pointer
    // merge — no per-row hash build); other id types keep the generic
    // array_intersect. Same results, spec-asserted. BOTH endpoint
    // columns must be integral: dispatching on src alone would
    // cast("long") a string dst to null and silently DROP those edges
    // via the null filter instead of taking the generic path.
    def isIntegral(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    val integralIds = isIntegral(edges.schema(srcCol).dataType) &&
      isIntegral(edges.schema(dstCol).dataType)
    if (integralIds)
      graft.expressions.GraftFunctions.register(edges.sparkSession)
    val und0 = edges
      .select(col(srcCol).as("u"), col(dstCol).as("v"))
    val und = (if (integralIds)
      und0.select(col("u").cast("long").as("u"), col("v").cast("long").as("v"))
    else und0)
      .where(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b"))
      .distinct()
      .persist()
    graft.Caches.track(und)

    val deg = und.select(col("a").as("id"))
      .unionByName(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
      .persist()
    graft.Caches.track(deg)

    // orient a—b from the smaller to the larger (degree, id) pair;
    // struct ordering gives the lexicographic total order directly
    // (field names aliased identically so both CASE branches carry the
    // same struct type)
    val ordA = struct(col("__da").as("d"), col("a").as("n"))
    val ordB = struct(col("__db").as("d"), col("b").as("n"))
    val oriented = und
      .join(deg.select(col("id").as("a"), col("degree").as("__da")), "a")
      .join(deg.select(col("id").as("b"), col("degree").as("__db")), "b")
      .select(
        when(ordA < ordB, col("a")).otherwise(col("b")).as("lo"),
        when(ordA < ordB, col("b")).otherwise(col("a")).as("hi"))
      .persist()
    graft.Caches.track(oriented)

    // oriented out-neighbour lists — ≤ O(√m) entries each by the
    // orientation bound, so collect_list is safe at any graph size
    val adj =
      if (integralIds)
        oriented.groupBy(col("lo")).agg(sort_array(collect_list(col("hi"))).as("nb"))
      else
        oriented.groupBy(col("lo")).agg(collect_list(col("hi")).as("nb"))

    // edge-iterator: for oriented edge (lo, hi), every common
    // out-neighbour w of lo and hi closes triangle {lo, hi, w} — found
    // exactly once, at its two lowest-order corners. hi-side adjacency
    // joins inner: an endpoint with no out-edges closes nothing.
    // The naive alternative (wedge SELF-JOIN then closure join)
    // materializes and shuffles an O(m^{3/2})-row wedge table — 41M
    // rows on the sf0.1 co-order graph; here the same intersections
    // run inside the projection on edge-sized rows. The adjacency
    // table is m entries spread over n rows (~16 MB at m = 1.2M):
    // below the cutoff it BROADCASTS, so edges stream through both
    // probes in one stage and the per-edge array payload is never
    // shuffled twice; above it, plain keyed joins (size dispatch on
    // the persisted edge count, the [[Components]] pattern).
    val attach =
      if (und.count() <= BroadcastAdjacencyEdges) (df: DataFrame) => broadcast(df)
      else (df: DataFrame) => df
    val closed = oriented
      .join(attach(adj.select(col("lo"), col("nb").as("__nbu"))), Seq("lo"))
      .join(attach(adj.select(col("lo").as("hi"), col("nb").as("__nbv"))), Seq("hi"))
      .select(col("lo"), col("hi"),
        (if (integralIds)
          call_function("sorted_intersect", col("__nbu"), col("__nbv"))
        else
          array_intersect(col("__nbu"), col("__nbv"))).as("__w"))
      .filter(size(col("__w")) > 0)

    // per-triangle corner credits: lo and hi once per common neighbour,
    // each common neighbour w once
    val perNode = closed
      .select(explode(col("__w")).as("id"), lit(1L).as("__t"))
      .unionByName(closed.select(col("lo").as("id"),
        size(col("__w")).cast("long").as("__t")))
      .unionByName(closed.select(col("hi").as("id"),
        size(col("__w")).cast("long").as("__t")))
      .groupBy("id").agg(sum(col("__t")).as("triangles"))

    // the integral kernel widened ids to long internally; restore the
    // input column type so downstream joins back on the original
    // column see an unchanged schema. Mixed-width integral endpoints
    // keep the wider long (lossless; the honest common type).
    val outId =
      if (integralIds &&
          edges.schema(srcCol).dataType == edges.schema(dstCol).dataType)
        col("id").cast(edges.schema(srcCol).dataType)
      else col("id")
    deg.join(perNode, Seq("id"), "left")
      .select(outId.as("id"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") >= 2,
          lit(2.0) * coalesce(col("triangles"), lit(0L)) /
            (col("degree") * (col("degree") - lit(1.0))))
          .otherwise(lit(0.0)).as("lcc"))
  }
}
