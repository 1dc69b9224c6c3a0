package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over a near-duplicate pair table — the "which copy do
  * we keep?" refinement of connected components: inside a duplicate
  * cluster the highest-PageRank member is the one most corroborated by
  * other members (hub of the similarity neighborhood), a better canonical
  * pick than min-id when clusters mix a template with its derivatives
  * (the Common Crawl canonical-URL trick applied to content graphs).
  *
  * Spark shape: degree + per-iteration contribution aggregations are
  * hash joins/aggs keyed on node id over the EDGE table — never
  * all-pairs; with a FIXED iteration count the plan is a finite join
  * chain (no driver loop state beyond the loop index, no lineage
  * explosion at 3 iterations). Edges come from the banded/capped LSH
  * pair generator, so edge count is bounded by the band caps — the
  * 100 TB cost tracks verified near-dup pairs, not corpus^2; rank state
  * is one row per node IN the dup graph (a small fraction of the
  * corpus).
  *
  * Determinism: fixed-point integer PageRank — initial rank 1e9, each
  * round `rank = 0.15e9 + 85 * sum(in-contribs) div 100` where a node's
  * contribution is `rank div degree`; bigint end to end, so the DuckDB
  * oracle (unrolled iteration CTEs) hash-matches every rank. Total mass
  * is conserved (~n * 1e9), so a single rank stays in long range until
  * the dup graph nears 9e9 members — beyond that, lower `r0`.
  */
object Centrality {

  private val R0 = 1000000000L

  /** Fixed-iteration integer PageRank over the undirected pair graph.
    * Returns (id, pr) for every node appearing in `pairs`. */
  def pagerank(pairs: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 10, s"iters out of range: $iters")
    val e0 = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
    // undirected: contribute both ways. Re-read every iteration — cache.
    val edges = TextKit.tracked(e0.union(e0.select(col("b"), col("a"))))
    val deg = TextKit.tracked(edges.groupBy("a").agg(count(lit(1)).as("d")))
    val withDeg = edges.join(deg, "a")
    var ranks = deg.select(col("a").as("id"), lit(R0).as("r"))
    for (_ <- 1 to iters) {
      val contrib = withDeg
        .join(ranks.withColumnRenamed("id", "a"), "a")
        .select(col("b").as("id"), expr("r div d").as("c"))
        .groupBy("id").agg(sum(col("c")).as("c"))
      // every node of an undirected graph has an in-edge, but the left
      // join + coalesce keeps the operator total on any pair table
      ranks = deg.select(col("a").as("id"))
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          expr(s"${R0 * 15 / 100}L + 85 * coalesce(c, 0L) div 100").as("r"))
    }
    ranks.select(col("id"), col("r").as("pr"))
  }

  /** Components + centrality fused: every dup-graph member labeled with
    * its component, its PageRank, and whether it is the component's
    * canonical pick (max rank, ties to the smaller id). */
  def canonicalByRank(pairs: DataFrame, iters: Int = 3): DataFrame = {
    // lineage-TRUNCATED, not merely cached: CC + the unrolled PageRank
    // chain re-reference the pair relation ~4x per iteration, and a
    // cache entry only short-circuits execution — Catalyst still
    // re-analyzes the full generator subtree at every action (for q133
    // the LSH chain under 3 unrolled iterations analyzed as a 2.5 MB
    // plan; truncation collapses it to one LogicalRDD leaf). register()
    // keeps releaseCaches() able to free the blocks.
    val p = TextKit.register(Components.truncated(
      pairs.select(col("doc_a"), col("doc_b"))))
    // cached: consumed by the canonical aggregation AND the final join —
    // uncached it would re-run the whole CC + PageRank chain per
    // consumer (measured 14.5 s -> ~7 s at sf0.1 for q133)
    val j = TextKit.tracked(Components.connectedComponents(p)
      .join(pagerank(p, iters).withColumnRenamed("id", "doc_id"), "doc_id"))
    // one aggregation: lexicographic max of (pr, -doc_id) IS
    // (max rank, ties to the smaller id)
    val canon = j.groupBy("component_id")
      .agg(max(struct(col("pr"), (-col("doc_id")).as("nid"))).as("m"))
      .select(col("component_id"), (-col("m.nid")).as("canon_id"))
    j.join(canon, "component_id")
      .select(col("doc_id"), col("component_id"), col("pr"),
        (col("doc_id") === col("canon_id")).as("is_canonical"))
  }
}
