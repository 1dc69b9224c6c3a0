package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair table — the clustering
  * step that turns pairwise dedup output (minhashLshPairs,
  * ngramJaccardPairs, embeddingNearDupBlocked) into duplicate GROUPS, so a
  * pipeline can keep one canonical document per cluster instead of
  * reasoning about overlapping pairs.
  *
  * Algorithm: min-label propagation with pointer jumping. Every node
  * starts labeled with its own id; each round every node (1) takes the
  * minimum label among itself and its neighbors, then (2) replaces its
  * label with its label's label (pointer jumping — the shortcut step of
  * Shiloach-Vishkin-style CC). Step 1 alone needs diameter rounds (a
  * path-shaped duplicate chain — exactly what chained near-dups produce —
  * makes that linear); step 2 halves the remaining pointer depth each
  * round, so convergence is O(log diameter) rounds. Converged labels are
  * the minimum id of each component — a deterministic canonical cluster
  * id.
  *
  * Scale design (100 TB): each round is two shuffle joins (edges × labels
  * and labels × labels, all keyed by id) plus one min-aggregation — no
  * driver-side graph, no per-component state. The convergence probe
  * exploits monotonicity: labels only ever DECREASE (each step takes a
  * min over a set containing the current label), so the rounds converged
  * exactly when sum(label) stops falling — ONE map-side-combinable
  * aggregate per round (decimal(38,0) sums stay exact at any id range),
  * replacing the earlier next⋈prev join probe. Each round's labels are
  * lineage-TRUNCATED (a cached LogicalRDD over the round's InternalRow
  * RDD): the round's plan references the previous labels FOUR times
  * (twice in the neighbor-min union, twice in the pointer-jump
  * self-join), so without truncation the logical plan grows 4^round and
  * Catalyst re-analysis — not execution — becomes the cost (observed:
  * 45 s for a 477-node graph, 3 s truncated). Truncation goes through
  * the CacheManager (not localCheckpoint, whose blocks Dataset.unpersist
  * cannot release), so each round frees the previous round's storage and
  * peak memory stays at two label generations + the edge set. The
  * alternating large-star/small-star algorithm (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond") additionally shrinks
  * the EDGE set as it converges; worth it when edges outnumber nodes by
  * enough that the per-round edge join dominates.
  */
object Components {

  /** Constant-size cached plan over `df`'s result: a LogicalRDD wrapping
    * the executed plan's InternalRow RDD, persisted through the
    * CacheManager so unpersist() actually frees the blocks (the
    * localCheckpoint alternative truncates lineage too, but its blocks
    * live outside the CacheManager and Dataset.unpersist can't release
    * them). Lazy: the first action on the returned frame materializes
    * the cache; a cache miss (executor loss) recomputes through the
    * wrapped RDD's own lineage. */
  private[ops] def truncated(df: DataFrame): DataFrame =
    org.apache.spark.sql.graftbridge.GraftBridge
      .internalCreateDataFrame(df.sparkSession, df.queryExecution.toRdd,
        df.schema)
      .persist()

  /** (doc_id, component_id) for every id appearing in `pairs`, where
    * component_id is the minimum doc id of the connected component.
    * Deterministic; only ids present in at least one pair are returned
    * (isolated docs are their own trivial component by definition). */
  def connectedComponents(pairs: DataFrame, aCol: String = "doc_a",
      bCol: String = "doc_b", maxIters: Int = 50): DataFrame = {
    val e0 = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    // undirected: propagate labels both ways. Truncated + cached: edges
    // and labels are re-referenced every round, and constant-size plans
    // keep Catalyst re-analysis out of the per-round cost (see scaladoc).
    val edges = truncated(e0.union(e0.select(col("dst"), col("src"))))
    // seeded init: label(v) = min(v, min(neighbors)) — exactly the state
    // the old identity init reached after round 1's neighbor-min step,
    // for the same one-shuffle cost the identity init paid for its
    // distinct(). Every component converges one round earlier; the
    // monotone-decrease invariant and the final component-min labels are
    // unchanged (labels stay node ids of the same component).
    var labels = truncated(edges.groupBy(col("src")).agg(
        least(min(col("dst")), col("src")).as("label"))
      .select(col("src").as("id"), col("label")))
    // exact at any scale: 10^12 ids each up to 10^12 still fit decimal(38,0).
    // sum() over ZERO rows is NULL — an empty pair table is a normal input
    // (a clean corpus has no near-dups), so it must read as 0, not NPE.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(
          sum(col("label").cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .head.getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = labelSum(labels) // also materializes the initial caches
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val prop = edges.join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("label"))
      // the pointer-jump self-join reads hop on both sides, but both
      // sides are the IDENTICAL aggregate subtree over truncated leaves,
      // so ReuseExchange serves the second side from the first side's
      // shuffle files — one less persist/unpersist round-trip per round
      // than the previous truncated-hop form, and only the post-shuffle
      // final aggregation evaluates twice (same shuffle data, no extra
      // network or label generation held in memory)
      val hop = labels.union(prop)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
      // pointer jump: follow the label one more step (labels are node ids,
      // so every label resolves; coalesce is belt-and-braces for roots)
      val next = truncated(hop.as("x")
        .join(hop.select(col("id").as("lid"), col("label").as("llabel")).as("y"),
          col("x.label") === col("y.lid"), "left")
        .select(col("x.id"), coalesce(col("y.llabel"), col("x.label")).as("label")))
      // labels only ever decrease, so an unchanged sum means NO label
      // moved — one aggregate action (which also materializes next's
      // cache), no per-round probe join
      val curSum = labelSum(next)
      converged = curSum.compareTo(prevSum) == 0
      prevSum = curSum
      labels.unpersist(blocking = false)
      labels = next
      iter += 1
      if (sys.props.contains("graft.cc.debug"))
        println(s"CC round $iter sum=$curSum")
    }
    edges.unpersist(blocking = false)
    // with pointer jumping, maxIters=50 covers diameters up to ~2^50 —
    // hitting it means something is wrong; wrong labels must not be
    // returned silently. Free the last round's cache on the failure path
    // too: a caller that catches and retries must not leak blocks only a
    // full clearCache() could reclaim.
    if (!converged) labels.unpersist(blocking = false)
    require(converged,
      s"connectedComponents did not converge in $maxIters rounds")
    // the returned frame reads the still-persisted labels cache (callers
    // usually aggregate over it repeatedly); the CACHED frame itself is
    // registered so TextKit.releaseCaches() frees it like every other
    // ops-layer cache (a projection would not match the cache entry)
    TextKit.register(labels)
    labels.select(col("id").as("doc_id"), col("label").as("component_id"))
  }

  /** Alternating large-star / small-star connected components (Kiveris
    * et al., "Connected Components in MapReduce and Beyond") — the
    * variant that SHRINKS the edge set as it converges. Prefer it over
    * [[connectedComponents]] when edges far outnumber nodes (a dup-heavy
    * pair table): min-label propagation pays the FULL edge relation in
    * every round's join, while these star operations rewrite the edge
    * set itself, so each round's shuffle tracks the current — rapidly
    * contracting — edge count.
    *
    * One round = large-star then small-star, each a groupBy-min plus a
    * projection over the symmetric edge set:
    *  - large-star: every node u connects each LARGER neighbor to
    *    min(N(u) ∪ u) — long chains shortcut toward small ids;
    *  - small-star: every node u connects its smaller-or-equal
    *    neighborhood (and itself) to that minimum — stars flatten.
    * Both preserve connectivity; alternation converges to a forest of
    * stars whose centers are the component minima. Convergence probe:
    * the (distinct) edge set is unchanged — an except + count over the
    * cached, shrinking relations. Same lineage-truncation discipline as
    * connectedComponents (each round re-references the previous edge
    * set several times). */
  def connectedComponentsStars(pairs: DataFrame, aCol: String = "doc_a",
      bCol: String = "doc_b", maxIters: Int = 50): DataFrame = {
    val e00 = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    // node universe BEFORE the self-edge filter: a doc appearing only in
    // a reflexive pair (42, 42) is its own trivial component and must be
    // labeled, exactly as connectedComponents labels it
    val allNodes = truncated(
      e00.select(col("src").as("id"))
        .union(e00.select(col("dst"))).distinct())
    val e0 = e00.filter(col("src") =!= col("dst"))
    def symmetric(df: DataFrame): DataFrame =
      df.union(df.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
    var edges = truncated(symmetric(e0))
    // the previous round's count is already known — carrying it in a
    // var saves one count job per round (edges is cached; the count was
    // pure bookkeeping)
    var nEdges = edges.count()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      // large-star: for each directed (src, dst > src): (dst, m) with
      // m = min over src's FULL neighborhood (and src itself)
      val mins = edges.groupBy(col("src"))
        .agg(least(min(col("dst")), col("src")).as("mn"))
      val ls = truncated(symmetric(
        edges.join(mins, "src")
          .filter(col("dst") > col("src"))
          .select(col("dst").as("src"), col("mn").as("dst"))
          .filter(col("src") =!= col("dst"))))
      // small-star: each node links its smaller neighbors AND itself to
      // the minimum of its smaller neighborhood
      val sm = ls.filter(col("dst") < col("src"))
      val smins = sm.groupBy(col("src")).agg(min(col("dst")).as("mn"))
      val ss = truncated(symmetric(
        sm.join(smins, "src")
          .filter(col("dst") =!= col("mn"))
          .select(col("dst").as("src"), col("mn").as("dst"))
          .union(smins.select(col("src"), col("mn").as("dst")))
          .filter(col("src") =!= col("dst"))))
      // set equality of distinct relations: same count and no novel edge
      // (&& short-circuits, so the except anti-join runs only on a
      // count match — usually just the final round)
      val nSS = ss.count()
      converged = nSS == nEdges && ss.except(edges).isEmpty
      ls.unpersist(blocking = false)
      edges.unpersist(blocking = false)
      edges = ss
      nEdges = nSS
      iter += 1
      if (sys.props.contains("graft.cc.debug"))
        println(s"CC-stars round $iter edges=${edges.count()}")
    }
    // failure path frees every cache this call created (edges is the
    // current round's relation; allNodes backs the root computation)
    if (!converged) {
      edges.unpersist(blocking = false)
      allNodes.unpersist(blocking = false)
    }
    require(converged,
      s"connectedComponentsStars did not converge in $maxIters rounds")
    // converged star forest: every non-root has exactly one (larger ->
    // smaller) edge, to its component's minimum; roots label themselves
    val nonRoot = edges.filter(col("src") > col("dst"))
      .select(col("src").as("id"), col("dst").as("label"))
    val roots = allNodes.join(nonRoot.select(col("id")), Seq("id"),
        "left_anti")
      .select(col("id"), col("id").as("label"))
    val labels = truncated(nonRoot.union(roots))
    // materialize the labels cache BEFORE dropping its inputs — otherwise
    // the caller's first action re-runs the final round's joins and the
    // allNodes distinct scan through lineage with the caches already gone
    labels.count()
    edges.unpersist(blocking = false)
    allNodes.unpersist(blocking = false)
    TextKit.register(labels)
    labels.select(col("id").as("doc_id"), col("label").as("component_id"))
  }

  /** Keep at most `m` deterministic representatives per cluster — the
    * consumer that turns a (doc_id, component_id) labeling
    * ([[connectedComponents]], [[graft.ops.Similarity.semanticClusters]],
    * q62's duplicate clusters) into a curated keep-set: within each
    * component, documents rank by their md5 hash (reproducible on any
    * partitioning — no rand(), no arrival order) and the `m`
    * smallest-ranked survive. Output: (component_id, doc_id, rank).
    *
    * Scale shape: one bounded per-cluster top-k aggregation
    * ([[TopKAgg]]'s map-side-combinable kit — no task ever holds more
    * than m rows per component), so a mega-cluster costs its row count
    * once, never a per-cluster sort. */
  def capPerCluster(labeled: DataFrame, m: Int = 2): DataFrame = {
    require(m >= 1, s"capPerCluster: m must be positive (got $m)")
    TopKAgg.topKPerQueryAsc(
        labeled.select(col("component_id"), col("doc_id"),
          TextKit.md5Long(col("doc_id")
            .cast(org.apache.spark.sql.types.StringType)).as("hkey")),
        "component_id", "doc_id", "hkey", m)
      .select(col("component_id"), col("neighbor_id").as("doc_id"),
        col("rank"))
  }

  /** Duplicate-cluster summary over a pair table: one row per component
    * with its canonical (minimum) doc id and member count — the shape a
    * keep-one-per-cluster dedup filter consumes. */
  def clusters(pairs: DataFrame, aCol: String = "doc_a",
      bCol: String = "doc_b"): DataFrame =
    connectedComponents(pairs, aCol, bCol)
      .groupBy(col("component_id"))
      .agg(count(lit(1)).as("n_members"))

  /** Triangle count over an ordered pair table (doc_a < doc_b): two
    * edge joins — e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c) — over the PERSISTED
    * edge list, so the (possibly expensive) pair generator runs once,
    * not once per join leg. Ordered edges count each triangle exactly
    * once; cost tracks Σ deg² of the pair graph, bounded by the band
    * caps that produced it — never corpus-quadratic. */
  def triangleCount(pairs: DataFrame): DataFrame = {
    val e = TextKit.tracked(
      pairs.select(col("doc_a").as("a"), col("doc_b").as("b")))
    val e2 = e.select(col("a").as("b2"), col("b").as("c"))
    val e3 = e.select(col("a").as("a3"), col("b").as("c3"))
    e.join(e2, col("b") === col("b2"))
      .join(e3, col("a") === col("a3") && col("c") === col("c3"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** k-core of the undirected pair graph: iteratively peel every node of
    * degree < k until fixpoint; returns (doc_id, degree) for the
    * surviving nodes with their degree INSIDE the core. The k-core is
    * the standard density filter over a near-dup graph — a pendant pair
    * of documents is circumstantial, a 2-core member sits in a cycle of
    * mutual near-duplicates (boilerplate families, template farms) and
    * is what a curation pass escalates on.
    *
    * Scale shape: each round is one degree aggregation plus two
    * semi-joins over a SHRINKING edge relation — per-round work tracks
    * surviving edges (bounded by the band caps that produced the
    * pairs), and the round count is the peeling depth of the graph
    * (tiny for near-dup graphs: clusters are near-cliques, which peel
    * in one round or survive whole). Round state is lineage-truncated
    * and cached exactly as in [[connectedComponents]] — constant-size
    * plans, two edge generations in memory. Fixpoint is detected by
    * the (monotone-decreasing) edge count; hitting `maxIters` fails
    * loudly rather than returning a half-peeled graph. */
  def kCore(pairs: DataFrame, k: Int, maxIters: Int = 30): DataFrame = {
    require(k >= 1, s"kCore: k must be >= 1, got $k")
    val e0 = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .distinct()
    var edges = truncated(e0.union(e0.select(col("dst"), col("src"))))
    var nEdges = edges.count()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      // degree >= k survivors; both endpoints must survive for the edge to
      val keep = truncated(edges.groupBy(col("src"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src").as("id")))
      val next = truncated(edges
        .join(keep.select(col("id").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("id").as("dst")), Seq("dst"), "left_semi")
        .select(col("src"), col("dst")))
      val nNext = next.count()
      converged = nNext == nEdges
      keep.unpersist(blocking = false)
      edges.unpersist(blocking = false)
      edges = next
      nEdges = nNext
      iter += 1
    }
    if (!converged) edges.unpersist(blocking = false)
    require(converged, s"kCore did not reach fixpoint in $maxIters rounds")
    edges.groupBy(col("src").as("doc_id"))
      .agg(count(lit(1)).as("degree"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007) over the
    * undirected pair graph, made fully DETERMINISTIC: every node starts
    * labeled with itself, and each round takes the neighbor label with
    * the highest frequency, ties broken toward the SMALLEST label —
    * argmax computed as `max(struct(cnt, -label))`, a pure keyed
    * aggregation (no window, no randomized visit order). A FIXED
    * synchronous round count (default 3, like [[Centrality.pagerank]])
    * keeps the DuckDB oracle an exact unrolled mirror.
    *
    * Communities refine connectivity: labels only travel along edges,
    * so two nodes sharing a label always share a component, but a
    * component can split into several denser communities — the lens CC
    * can't give (a giant chained component of template families stays
    * ONE component while LPA separates the families).
    *
    * Scale shape: per round, one keyed edge-label join + two keyed
    * aggregations over the pair relation — cost tracks EDGES (bounded
    * by the band caps that produced them), state is one (node, label)
    * row per node, rounds are lineage-truncated and cached exactly as
    * in [[connectedComponents]]. */
  def labelPropagation(pairs: DataFrame, iters: Int = 3,
      aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    require(iters >= 1, s"labelPropagation: iters must be >= 1, got $iters")
    val e = TextKit.register(truncated(
      pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
        .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))))
    var labels = e.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    // Unlike connectedComponents, each LPA round references the previous
    // labels exactly ONCE (the edge-label join), so the unrolled plan
    // grows linearly, not 4^round — at the fixed default of 3 rounds the
    // whole chain stays one small tree over the truncated edge leaf.
    // Executing it as ONE job (no per-round truncation) drops 3
    // materialization jobs and 3 cache write/read round-trips per call;
    // convergence never needs probing because the round count is fixed.
    for (_ <- 1 to iters) {
      labels = e
        .join(labels.select(col("node").as("dst"), col("label")), Seq("dst"))
        .groupBy(col("src"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("src"))
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("src").as("node"), (-col("m.nl")).as("label"))
    }
    labels.select(col("node").as("doc_id"), col("label").as("community"))
  }
}

