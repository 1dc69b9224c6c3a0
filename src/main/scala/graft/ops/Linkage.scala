package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / fuzzy entity resolution: match each left-side entity
  * to its best right-side candidate under an edit-distance threshold,
  * with BLOCKING doing the scale work — candidates are generated only
  * within a shared blocking key (first token, prefix, phonetic code …),
  * never corpus × corpus.
  *
  * Spark shape: one equi-join on the block key (the only wide exchange),
  * a codegen'd `levenshtein` filter on the block-local pairs, and one
  * lexicographic-min aggregation picking the best match per left entity.
  * Hot blocks are capped FIRST (the LSH band-cap argument — an
  * over-populated block is a useless discriminator and a quadratic
  * bomb): right-side blocks over `blockCap` are dropped whole, loudly
  * countable by comparing input/output entities.
  *
  * Determinism: Levenshtein is the textbook DP (identical in DuckDB);
  * best match = min (distance, candidate key) — total order, no
  * arrival-order dependence. */
object Linkage {

  /** Resolve each row of `left` against `right`: returns (leftKey,
    * matchKey, dist) for every left entity with at least one candidate
    * within `maxDist` in its (capped) block. Both inputs need
    * (key, name, block) columns — build blocks with any deterministic
    * expression, e.g. `split(col("name"), " ").getItem(0)`. */
  def fuzzyResolve(left: DataFrame, right: DataFrame, maxDist: Int,
      blockCap: Int = 1024): DataFrame = {
    require(maxDist >= 0 && blockCap >= 1)
    val ok = right.groupBy("block").agg(count(lit(1)).as("n"))
      .filter(col("n") <= blockCap).select("block")
    val r = right.join(ok, "block")
      .select(col("block"), col("key").as("cand_key"),
        col("name").as("cand_name"))
    left.select(col("block"), col("key").as("left_key"), col("name"))
      .join(r, "block")
      .withColumn("dist", levenshtein(col("name"), col("cand_name")))
      .filter(col("dist") <= maxDist)
      .groupBy("left_key")
      .agg(min(struct(col("dist"), col("cand_key"))).as("m"))
      .select(col("left_key"), col("m.cand_key").as("match_key"),
        col("m.dist").as("dist"))
  }

  /** Entity resolution — the full master-data pipeline over ONE record
    * set: blocked fuzzy pairing (edit distance inside hot-capped
    * blocks, the [[fuzzyResolve]] anatomy but ALL within-threshold
    * pairs, not best-match), transitive closure via
    * [[graft.ops.Components.connectedComponents]] (A~B and B~C merge
    * into one entity even when A and C differ by more than `maxDist`),
    * then consolidation: each record carries its entity id (the
    * cluster's minimum key — a real record), a canonical flag, and the
    * canonical record's name as the survived attribute.
    *
    * Shape at scale: pairing is the blocked quadratic with the
    * `blockCap` guard (never corpus²), CC is the pointer-jumping
    * chain (log-round keyed joins), consolidation is one self-join on
    * the 1-row-per-entity canon relation. Unmatched records are their
    * own entity — the output is TOTAL over the input. */
  def entityResolution(recs: DataFrame, maxDist: Int = 1,
      blockCap: Int = 1024): DataFrame = {
    require(maxDist >= 0 && blockCap >= 1)
    val ok = recs.groupBy("block").agg(count(lit(1)).as("n"))
      .filter(col("n") <= blockCap).select("block")
    val b = recs.join(ok, "block")
    val pairs = b.select(col("block"), col("key").as("doc_a"),
        col("name").as("an"))
      .join(b.select(col("block"), col("key").as("doc_b"),
        col("name").as("bn")), "block")
      .filter(col("doc_a") < col("doc_b") &&
        levenshtein(col("an"), col("bn")) <= maxDist)
      .select("doc_a", "doc_b")
    val comp = graft.ops.Components.connectedComponents(pairs)
    val ent = recs.join(comp, recs("key") === comp("doc_id"), "left")
      .select(recs("key"), recs("name"),
        coalesce(col("component_id"), recs("key")).as("entity_id"))
    val canon = ent.filter(col("key") === col("entity_id"))
      .select(col("entity_id").as("ce"), col("name").as("canonical_name"))
    ent.join(canon, col("entity_id") === col("ce"))
      .select(col("key"), col("name"), col("entity_id"),
        (col("key") === col("entity_id")).as("is_canonical"),
        col("canonical_name"))
  }
}
