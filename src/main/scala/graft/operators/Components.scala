package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair list — the step between
  * near-dup PAIR mining ([[Dedup]], [[Similarity]]) and an actually
  * deduplicated corpus: near-duplication is not transitive, but dedup
  * policy treats it as if it were (keep ONE doc per similarity cluster),
  * so pairs must first be closed into components. No reference
  * implementation (SURVEY.md §7.4 LLM-pipeline category); algorithm is
  * the standard large-graph label propagation (a.k.a. "hash-to-min")
  * plus pointer jumping: every node adopts the smallest component id
  * among itself and its neighbours, AND then its candidate label's own
  * current label (labels are node ids, so a label lookup is a self-join)
  * — path lengths double per round, until a fixpoint.
  *
  * Scale shape: each iteration is one aggregation over the (narrow)
  * edge list joined to current labels plus one label self-join — no
  * driver-side graph, no union-find in memory; rounds needed =
  * O(log diameter) (neighbour-only propagation would be O(diameter) —
  * a >20-hop duplicate chain would exit non-converged). A non-converged
  * exit throws rather than returning mixed components.
  * The edge list is symmetrized once up front; iteration stops when an
  * iteration changes no label (checked with one count per round — the
  * driver-side loop is bounded by `maxIterations`, not data size).
  * Each round's labels are `localCheckpoint`ed: labels feed TWO plan
  * branches per round (the neighbour aggregation and the join back), so
  * without lineage TRUNCATION the logical plan doubles every round and
  * planning itself blows up long before the data does — persist alone
  * caches execution but not the plan. (On a real cluster prefer
  * `sc.setCheckpointDir` + `checkpoint()` for fault tolerance;
  * localCheckpoint trades lineage-replay recovery for speed, the right
  * trade in a bounded iterative refinement.)
  */
object Components {

  /** (id_a, id_b) pairs → (id, component) where component = min doc id
    * reachable in the undirected closure. Nodes appearing only as
    * singletons must be fed through `allIds` (a near-dup pair list by
    * construction omits unique docs); pass null to label pair members
    * only.
    *
    * Size-gated hybrid: a dedup-cluster graph is usually TINY relative
    * to the corpus it came from (it has one node per distinct content
    * class in some pair), so when the deduped edge list fits the
    * `driverSideLimit` gate it is collected and closed with union-find —
    * O(E·α) in one pass, no per-round shuffle overhead (measured 7.7 s →
    * 0.3 s on a 292k-edge class graph at sf0.1). Past the gate (or with
    * `driverSideLimit = 0`) the distributed label propagation runs; both
    * paths produce identical labels (spec-asserted).
    */
  /** Hard ceiling on [[connectedComponents]]'s `driverSideLimit`: 50M
    * symmetrized edges ≈ 800 MB of boxed (Long, Long) on the driver —
    * beyond this the collect itself is the failure mode. The gate makes
    * a miscalled 100 TB graph fail with THIS message instead of a
    * driver OOM half an hour in (the q141/q74 bounded-broadcast
    * convention).
    */
  val MaxDriverSideEdges: Long = 50000000L

  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          allIds: DataFrame = null, idCol: String = "id",
                          maxIterations: Int = 20,
                          driverSideLimit: Long = 5000000L): DataFrame = {
    require(driverSideLimit <= MaxDriverSideEdges,
      s"driverSideLimit=$driverSideLimit exceeds the $MaxDriverSideEdges-edge " +
        "driver-collect ceiling; the distributed pointer-jumping path handles " +
        "any size — lower the limit (or pass 0 to force distributed)")
    val spark = pairs.sparkSession
    // symmetrize once: src -> dst and dst -> src
    val fwd = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
    val edges = fwd.unionByName(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()
    val edgeCount = edges.count()
    if (edgeCount <= driverSideLimit) {
      val result = unionFindDriverSide(spark, edges, allIds, idCol)
      edges.unpersist(blocking = false)
      return result
    }
    val nodes0 = edges.select(col("src").as("id")).distinct()
    val nodes = (if (allIds == null) nodes0
                 else nodes0.unionByName(allIds.select(col(idCol).cast("long").as("id")))
                   .distinct())
    // curCk is always the CHECKPOINTED df backing `labels`; the previous
    // round's checkpoint is released once the next one is materialized
    var curCk = nodes.select(col("id"), col("id").as("component")).localCheckpoint(true)
    var labels = curCk
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxIterations) {
      // candidate label per node: min over (own, neighbours' labels)
      val viaEdges = edges.join(labels.withColumnsRenamed(
          Map("id" -> "dst", "component" -> "nbr")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("nbr")).as("nbr_min"))
      val cand = labels.join(viaEdges, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("cand"),
          col("component").as("prev"))
      // pointer jump: a label is itself a node id, so each node also
      // adopts its candidate label's OWN current label — path lengths
      // double per round, turning O(diameter) neighbour-only propagation
      // into O(log diameter) (labels only ever decrease, so the jump is
      // always sound)
      // eager localCheckpoint: computes the round AND truncates lineage
      val next = cand.join(labels.withColumnsRenamed(
          Map("id" -> "cand", "component" -> "cand_lbl")), Seq("cand"), "left")
        .select(col("id"),
          least(col("cand"), coalesce(col("cand_lbl"), col("cand"))).as("component"),
          col("prev"))
        .localCheckpoint(true)
      changed = next.filter(col("component") =!= col("prev")).count()
      curCk.unpersist(blocking = false)
      curCk = next
      labels = next.select("id", "component")
      round += 1
    }
    edges.unpersist(blocking = false)
    // non-convergence is a correctness failure, not a degraded answer:
    // labels would still mix components. Fail loudly — with pointer
    // jumping, hitting this needs a component diameter over ~2^maxIterations
    if (changed > 0) {
      curCk.unpersist(blocking = false)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIterations rounds " +
          s"($changed labels still changing); raise maxIterations")
    }
    graft.Caches.track(curCk)
    labels
  }

  /** Union-find with path compression + union-by-min over a collected
    * edge list (the under-gate path of [[connectedComponents]]): the
    * bounded-collect pattern — the edge list was already counted, the
    * result mapping is one broadcastable (id → component) table.
    */
  private def unionFindDriverSide(spark: org.apache.spark.sql.SparkSession,
                                  edges: DataFrame, allIds: DataFrame,
                                  idCol: String): DataFrame = {
    import spark.implicits._
    val es = edges.as[(Long, Long)].collect()
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var root = x
      while (parent.getOrDefault(root, root) != root) root = parent.get(root)
      // path compression
      var cur = x
      while (parent.getOrDefault(cur, cur) != cur) {
        val nxt = parent.get(cur); parent.put(cur, root); cur = nxt
      }
      root
    }
    def union(a: Long, b: Long): Unit = {
      val ra = find(a); val rb = find(b)
      // union by MIN id so the root IS the canonical label
      if (ra < rb) parent.put(rb, ra)
      else if (rb < ra) parent.put(ra, rb)
    }
    es.foreach { case (a, b) => parent.putIfAbsent(a, a); parent.putIfAbsent(b, b); union(a, b) }
    val labeled = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    parent.keySet().forEach(id => labeled += ((id, find(id))))
    var out = labeled.toSeq.toDF("id", "component")
    if (allIds != null) {
      val extra = allIds.select(col(idCol).cast("long").as("id"))
        .distinct()
        .join(out.select(col("id")), Seq("id"), "left_anti")
        .select(col("id"), col("id").as("component"))
      out = out.unionByName(extra)
    }
    out
  }

  /** The dedup decision itself: one row per component with the canonical
    * (minimum) id and the ids to drop — `connectedComponents` composed
    * into the form a dedup pipeline consumes.
    */
  def dedupClusters(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    connectedComponents(pairs, aCol, bCol)
      .groupBy(col("component"))
      .agg(min(col("id")).as("keep_id"),
        sort_array(collect_list(col("id"))).as("member_ids"),
        count(lit(1)).as("cluster_size"))
      .select(col("keep_id"), col("member_ids"), col("cluster_size"))
}
