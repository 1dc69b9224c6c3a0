package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture primitives over lake tables — the MERGE / diff /
  * history family every warehouse lake grows once data stops being
  * append-only: apply an upsert+delete batch (Delta/Iceberg `MERGE INTO`),
  * diff two snapshots (change data feed), and build SCD-2 validity
  * intervals from a change log.
  *
  * Spark shapes, sized for 100 TB targets with small-fraction change
  * batches:
  *  - [[applyChanges]]: the change batch is first collapsed to ONE row
  *    per key (a hash aggregation on the batch — the small side), then a
  *    single full-outer hash join against the target applies it. AQE
  *    broadcasts the collapsed batch when it fits, making the apply a
  *    broadcast probe over the target scan — no target shuffle at all;
  *    when the batch is genuinely large both sides shuffle once on the
  *    key, the floor for any keyed merge.
  *  - [[snapshotDiff]]: one full-outer join on the key comparing a
  *    struct of the tracked columns — never a column-by-column join
  *    cascade. Emits insert/delete/update rows only (unchanged rows
  *    drop out), so the output is proportional to the CHANGE volume.
  *  - [[scd2]]: one window per key ordered by (ts, tiebreak) — state is
  *    per-key history, never global; collapse of no-op updates happens
  *    in the same window pass via lag.
  *
  * Determinism: "latest" is an explicit total order (ordCol, then key
  * ordinal), never arrival order; every output is hash-comparable
  * against a DuckDB re-derivation.
  */
object Cdc {

  /** Apply a CDC batch onto a keyed target: `changes` carries the key,
    * an ordering column (version/sequence — highest wins), an `op`
    * column ('U' upsert / 'D' delete), and the full payload. Returns the
    * merged table: target rows overwritten by the latest 'U', removed by
    * a latest 'D', untouched keys passed through, fresh 'U' keys
    * inserted. Payload columns must match the target's non-key columns.
    *
    * `broadcastBatch = true` (default — CDC batches are a small fraction
    * of the target) plans the Delta-MERGE shape: the collapsed batch
    * broadcast-probes the target scan (LEFT join, target NEVER
    * shuffles), and inserts are found by probing the target's keys with
    * the same broadcast and anti-joining the two SMALL relations — two
    * narrow passes over the target, zero wide exchanges of it. Set it
    * false for a genuinely table-sized batch: one full-outer hash join,
    * both sides shuffling once on the key (the floor for any keyed
    * merge). */
  def applyChanges(target: DataFrame, changes: DataFrame, key: String,
      ordCol: String, op: String = "op",
      broadcastBatch: Boolean = true): DataFrame = {
    val payload = target.columns.filterNot(_ == key)
    require(payload.forall(changes.columns.contains),
      s"changes missing payload columns: " +
        payload.filterNot(changes.columns.contains).mkString(", "))
    // latest change per key: lexicographic max of (ord, op, payload) —
    // ONE hash aggregation over the batch, map-side combinable
    val latest = changes
      .groupBy(col(key))
      .agg(max(struct((col(ordCol) +: col(op) +: payload.map(col)): _*))
        .as("c"))
      .select(col(key) +: col(s"c.$op").as("__op") +:
        payload.map(p => col(s"c.$p").as(s"__c_$p")): _*)
    if (broadcastBatch) {
      val lb = broadcast(latest)
      // pass 1: update/delete/pass-through — broadcast probe, no target
      // shuffle; the filter drops latest-'D' keys
      val merged = target.join(lb, Seq(key), "left")
        .filter(col("__op").isNull || col("__op") === "U")
        .select(col(key) +: payload.map { p =>
          when(col("__op") === "U", col(s"__c_$p")).otherwise(col(p)).as(p)
        }: _*)
      // pass 2: inserts = upserted keys absent from the target. The
      // matched-key set is found by probing the target's KEY COLUMN with
      // the same broadcast (narrow, column-pruned scan); it is bounded
      // by the batch size, so the final anti-join is small × small
      val matched = target.select(col(key))
        .join(lb.select(col(key)), Seq(key))
      val inserts = latest.filter(col("__op") === "U")
        .join(broadcast(matched), Seq(key), "left_anti")
        .select(col(key) +: payload.map(p => col(s"__c_$p").as(p)): _*)
      merged.unionByName(inserts)
    } else {
      target.join(latest, Seq(key), "full_outer")
        .filter(col("__op").isNull || col("__op") === "U")
        .select(col(key) +: payload.map { p =>
          when(col("__op") === "U", col(s"__c_$p")).otherwise(col(p)).as(p)
        }: _*)
    }
  }

  /** Diff snapshot `b` against snapshot `a` on `key`, tracking `cols`:
    * one row per changed key with change_type in (insert, delete,
    * update) plus the old/new tracked values as structs. Unchanged keys
    * produce nothing, so output size tracks the real change volume. */
  def snapshotDiff(a: DataFrame, b: DataFrame, key: String,
      cols: Seq[String]): DataFrame = {
    def packed(df: DataFrame, tag: String): DataFrame =
      df.select(col(key), struct(cols.map(col): _*).as(tag))
    packed(a, "old_row").join(packed(b, "new_row"), Seq(key), "full_outer")
      .withColumn("change_type",
        when(col("old_row").isNull, lit("insert"))
          .when(col("new_row").isNull, lit("delete"))
          .when(!(col("old_row") <=> col("new_row")), lit("update")))
      .filter(col("change_type").isNotNull)
      .select(col(key), col("change_type"), col("old_row"), col("new_row"))
  }

  /** SCD-2 validity intervals from a change log: rows (key, ts, attrs…)
    * become versioned history rows with [valid_from, valid_to) half-open
    * intervals and an is_current flag; consecutive rows whose tracked
    * attributes did not change are collapsed into the earlier interval
    * (no-op updates emit no version). `tiebreak` totally orders equal
    * timestamps. Both windows share ONE per-key sort. */
  def scd2(log: DataFrame, key: String, ts: String, tiebreak: String,
      attrs: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
    val packed = struct(attrs.map(col): _*)
    val changed = log
      .withColumn("__prev", lag(packed, 1).over(w))
      .filter(!(col("__prev") <=> packed))
      .drop("__prev")
    // second window over the COLLAPSED rows: the next change bounds me
    val w2 = Window.partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
    changed
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(key) +: attrs.map(col) :+ col("valid_from") :+
        col("valid_to") :+ col("is_current"): _*)
  }
}
