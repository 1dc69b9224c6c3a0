package graft

import org.apache.spark.sql.functions._
import graft.ops.{Cdc, Funnel, Eval}

/** CDC merge/diff/history semantics on hand-built fixtures, plus the
  * funnel and retrieval-eval operators. */
class CdcSpec extends SparkSpec {

  test("applyChanges: upsert, delete, insert, untouched, latest-wins") {
    import spark.implicits._
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("k", "name", "price")
    val changes = Seq(
      (2L, 1L, "U", "b2", 21.0),  // update
      (3L, 1L, "D", null, 0.0),   // delete
      (5L, 1L, "U", "e", 50.0),   // insert
      (4L, 1L, "U", "d-old", 41.0), // superseded by…
      (4L, 2L, "U", "d-new", 42.0)  // …the later version
    ).toDF("k", "v", "op", "name", "price")
    val out = Cdc.applyChanges(target, changes, "k", "v")
      .orderBy("k").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L, 5L))
    val byK = out.map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(byK(1L) === (("a", 10.0)))     // untouched
    assert(byK(2L) === (("b2", 21.0)))    // updated
    assert(byK(4L) === (("d-new", 42.0))) // latest version wins
    assert(byK(5L) === (("e", 50.0)))     // inserted
  }

  test("applyChanges: delete version beats earlier upsert") {
    import spark.implicits._
    val target = Seq((1L, "a")).toDF("k", "name")
    val changes = Seq((1L, 1L, "U", "a2"), (1L, 2L, "D", null))
      .toDF("k", "v", "op", "name")
    assert(Cdc.applyChanges(target, changes, "k", "v").count() === 0L)
  }

  test("applyChanges: broadcast and shuffle modes agree; broadcast never sorts-merges") {
    import spark.implicits._
    val target = (1L to 200L).map(k => (k, s"n$k", k * 1.0))
      .toDF("k", "name", "price")
    val changes = (1L to 200L).filter(_ % 5 == 0).map { k =>
      (k, 1L, if (k % 3 == 0) "D" else "U", s"u$k", k * 2.0)
    }.toDF("k", "v", "op", "name", "price") union
      Seq((500L, 1L, "U", "fresh", 9.0)).toDF("k", "v", "op", "name", "price")
    val bc = Cdc.applyChanges(target, changes, "k", "v")
    val sh = Cdc.applyChanges(target, changes, "k", "v",
      broadcastBatch = false)
    assert(bc.orderBy("k").collect().toSeq ===
      sh.orderBy("k").collect().toSeq)
    // the 100 TB claim: the broadcast path never shuffles the target into
    // a sort-merge join — every join is a broadcast hash probe
    val plan = bc.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("applyChanges rejects changes missing payload columns") {
    import spark.implicits._
    val target = Seq((1L, "a", 1.0)).toDF("k", "name", "price")
    val changes = Seq((1L, 1L, "U", "x")).toDF("k", "v", "op", "name")
    val e = intercept[IllegalArgumentException] {
      Cdc.applyChanges(target, changes, "k", "v")
    }
    assert(e.getMessage.contains("price"))
  }

  test("snapshotDiff emits only changed keys, typed") {
    import spark.implicits._
    val a = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "x")
    val b = Seq((2L, 20.0), (3L, 31.0), (4L, 40.0)).toDF("k", "x")
    val out = Cdc.snapshotDiff(a, b, "k", Seq("x"))
      .select("k", "change_type").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "delete", 3L -> "update", 4L -> "insert"))
  }

  test("scd2 collapses no-op updates and bounds intervals") {
    import spark.implicits._
    val log = Seq(
      (1L, 100L, 1L, "red"), (1L, 200L, 2L, "red"),  // no-op collapses
      (1L, 300L, 3L, "blue"), (1L, 400L, 4L, "red"), // re-change re-opens
      (2L, 150L, 5L, "green"))
      .toDF("k", "ts", "seq", "attr")
    val out = Cdc.scd2(log, "k", "ts", "seq", Seq("attr"))
      .orderBy("k", "valid_from")
      .select("k", "attr", "valid_from", "valid_to", "is_current")
      .collect()
    assert(out.length === 4)
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getString(1)).toSeq === Seq("red", "blue", "red"))
    assert(k1.map(_.getLong(2)).toSeq === Seq(100L, 300L, 400L))
    assert(k1(0).getLong(3) === 300L && k1(1).getLong(3) === 400L)
    assert(k1(2).isNullAt(3) && k1(2).getBoolean(4))
    assert(!k1(0).getBoolean(4) && !k1(1).getBoolean(4))
  }

  test("funnel enforces strict step ordering") {
    import spark.implicits._
    def ev(user: Long, ts: Long, t: String) = (user * 100 + ts, ts * 1000, user, t)
    // user 1 completes in order; user 2 clicks BEFORE viewing (click
    // must not count), then purchases after view only — stage 1;
    // user 3 views only; user 4 has an orphan purchase — stage 0
    val rows = Seq(
      ev(1, 10, "view"), ev(1, 20, "click"), ev(1, 30, "purchase"),
      ev(2, 10, "click"), ev(2, 20, "view"), ev(2, 30, "purchase"),
      ev(3, 10, "view"),
      ev(4, 10, "purchase"))
    val events = rows.toDF("event_id", "ts", "user_id", "event_type")
    val out = Funnel.funnel(events, Seq("view", "click", "purchase"))
      .orderBy("user_id").collect()
    val stages = out.map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(stages === Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 0))
    // user 1 timestamps chain strictly: ts div 1000 == raw ts here
    val u1 = out.find(_.getLong(0) == 1L).get
    assert(Seq(u1.getLong(2), u1.getLong(3), u1.getLong(4)) === Seq(10L, 20L, 30L))
  }

  test("retrievalMetrics scores hits, misses, and absent queries") {
    import spark.implicits._
    val truth = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1), (2L, 21L, 2))
      .toDF("query_id", "neighbor_id", "rank")
    val result = Seq((1L, 11L, 1), (1L, 99L, 2)) // one hit at rank 1; q2 absent
      .toDF("query_id", "neighbor_id", "rank")
    val m = Eval.retrievalMetrics(truth, result).orderBy("query_id").collect()
    assert(m(0).getDouble(3) === 0.5) // recall q1
    assert(m(0).getDouble(5) === 1.0) // mrr q1: first hit at rank 1
    assert(m(1).getLong(2) === 0L)    // q2: no hits
    assert(m(1).getDouble(3) === 0.0 && m(1).getDouble(5) === 0.0)
    assert(m(1).isNullAt(4))          // no first_hit_rank
  }

  test("streamLatestValue merges state across batches; tombstone then re-insert") {
    import org.apache.spark.sql.functions._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-cdc-stream")
    def write(name: String, mtime: Long,
        rows: Seq[(Long, String, Long, String, Double)]): Unit = {
      val stage = Files.createTempDirectory("graft-cdc-stage")
      import spark.implicits._
      rows.toDF("event_id", "ts_str", "user_id", "event_type", "value")
        .select(col("event_id"), to_timestamp(col("ts_str")).as("ts"),
          col("user_id"), col("event_type"), col("value"),
          lit("{}").as("props"))
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = Files.list(stage).filter(p =>
        p.toString.endsWith(".parquet")).findFirst().get()
      val dst = dir.resolve(name)
      Files.copy(part, dst)
      dst.toFile.setLastModified(mtime)
    }
    write("b1.parquet", 1000000L, Seq(
      (1L, "2024-01-10 10:00:00", 1L, "signup", 1.0),
      (2L, "2024-01-10 10:00:00", 2L, "signup", 2.0),
      (3L, "2024-01-10 10:00:00", 3L, "signup", 3.0)))
    write("b2.parquet", 2000000L, Seq(
      (4L, "2024-01-10 11:00:00", 1L, "purchase", 10.0), // update
      (5L, "2024-01-10 11:00:00", 2L, "error", 0.0),     // tombstone
      (6L, "2024-01-10 11:00:00", 3L, "error", 0.0)))    // tombstone
    write("b3.parquet", 3000000L, Seq(
      (7L, "2024-01-10 12:00:00", 2L, "view", 20.0)))    // re-insert
    val out = graft.streaming.StreamingOps
      .streamLatestValue(spark, dir.toString, glob = "*.parquet",
        maxFilesPerTrigger = Some(1))
      .collect().map(r => (r.getLong(0), r.getString(2), r.getDouble(3)))
    // user 1: updated in batch 2; user 2: tombstoned then re-inserted in
    // batch 3 (state had to survive the tombstone); user 3: stays deleted
    assert(out.toSet === Set((1L, "purchase", 10.0), (2L, "view", 20.0)))
  }

  test("winnowContainment finds a quoted paragraph at near-zero Jaccard") {
    import spark.implicits._
    val para = "quantum flux capacitors resonate harmonically under " +
      "cryogenic isolation protocols"
    val filler = (1 to 60).map(i => s"corpusword$i").mkString(" ")
    val batchFiller = (1 to 60).map(i => s"batchword$i").mkString(" ")
    val corpus = Seq((1L, s"$filler $para"), (2L, filler + " unrelated end"))
      .toDF("doc_id", "text")
    val batch = Seq((10L, s"$batchFiller $para"), (11L, batchFiller))
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.winnowContainment(corpus, batch)
      .select("doc_a", "doc_b", "n_shared").as[(Long, Long, Long)]
      .collect()
    // only (corpus 1, batch 10) share the paragraph; overall Jaccard of
    // those docs is ~10/130 yet containment must fire
    assert(out.map(t => (t._1, t._2)).toSet === Set((1L, 10L)))
    assert(out.head._3 >= 1L)
  }

  test("winnowing guarantee: >= w-token shared run shares a fingerprint") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val a = s"one two three $shared four five"
    val b = s"$shared completely different tail words here"
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val fp = graft.ops.TextAnalysis.winnowing(docs, 4)
      .select("doc_id", "sel_hash").as[(Long, Long)].collect()
    val h1 = fp.filter(_._1 == 1L).map(_._2).toSet
    val h2 = fp.filter(_._1 == 2L).map(_._2).toSet
    assert((h1 & h2).nonEmpty, "shared 8-token run must share a fingerprint")
    // density: ~2/(w+1) of positions selected, never more than all windows
    assert(h1.size < a.split(" ").length)
  }
}
