package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.lake.ManifestCommit

/** The SQL-native lake surface: CREATE/INSERT/SELECT/ALTER through a
  * plain `spark.sql` session flow through the manifest commit protocol
  * and stay interchangeable with the library path. */
class SqlCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def sqlSession(warehouse: String) = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "2")
    ss.conf.set("spark.sql.catalog.g", "graft.lake.GraftCatalog")
    ss.conf.set("spark.sql.catalog.g.warehouse", warehouse)
    ss
  }

  test("CREATE + INSERT + SELECT through plain SQL == the library read; " +
      "the insert is one atomic manifest commit") {
    val wh = Files.createTempDirectory("graft-sqlcat").toString
    val ss = sqlSession(wh)
    ss.sql("CREATE NAMESPACE g.db")
    ss.sql("CREATE TABLE g.db.t (k BIGINT, v DOUBLE)")
    // the declared schema is RECORDED at create: open is one manifest
    // GET, no footer inference, even before any data lands
    val dir = new Path(s"$wh/db/t")
    val fs = dir.getFileSystem(ss.sparkContext.hadoopConfiguration)
    assert(ManifestCommit.currentSchema(fs, dir).map(_.fieldNames.toSeq)
      .contains(Seq("k", "v")))
    ss.range(100).select($"id".as("k"), ($"id" * 0.5).as("v"))
      .createOrReplaceTempView("src")
    ss.sql("INSERT INTO g.db.t SELECT k, v FROM src")
    ss.sql("INSERT INTO g.db.t SELECT k + 100, v FROM src")
    // SQL read == library read (the manifest is the one source of truth)
    val viaSql = ss.sql("SELECT k, v FROM g.db.t").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val viaLib = ManifestCommit.readTable(ss, dir.toString)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Double]("v"))).toSet
    assert(viaSql == viaLib && viaSql.size == 200)
    // each insert was ONE commit (history: bootstrap + schema + 2 appends)
    val kinds = ManifestCommit.history(ss, dir).collect()
      .map(_.getString(1)).toSeq
    assert(kinds.count(_ == "append") >= 2, s"history kinds: $kinds")
    // column pruning reaches the reader: a 1-column projection's scan
    // schema is 1 field
    val plan = ss.sql("SELECT k FROM g.db.t").queryExecution
      .executedPlan.toString
    assert(plan.contains("graft-sql"), plan)
    assert(ss.sql("SELECT k FROM g.db.t").collect().length == 200)
  }

  test("a table created by LIBRARY calls reads through SQL, and a SQL " +
      "table accepts library commits — one format, two surfaces") {
    val wh = Files.createTempDirectory("graft-sqlcat2").toString
    val ss = sqlSession(wh)
    val dir = new Path(s"$wh/lib_t")
    val fs = dir.getFileSystem(ss.sparkContext.hadoopConfiguration)
    graft.ops.Layout.writeLinear(
      spark.range(50).select($"id".as("k"), ($"id" % 5).as("g")),
      col("k"), dir.toString, 2)
    ManifestCommit.bootstrap(fs, dir)
    ManifestCommit.recordSchema(spark, dir)
    assert(ss.sql("SELECT sum(k) AS s FROM g.lib_t").head.getLong(0)
      == (0 until 50).sum)
    // library append lands; SQL sees it without any refresh verb
    ManifestCommit.stageAndPublish(ss, dir,
      ss.range(10).select(($"id" + 100).as("k"), ($"id" % 5).as("g")),
      _ => true).getOrElse(fail("publish"))
    assert(ss.sql("SELECT count(*) AS n FROM g.lib_t").head.getLong(0)
      == 60L)
  }

  test("refusals stay loud: INSERT OVERWRITE and non-additive ALTER") {
    val wh = Files.createTempDirectory("graft-sqlcat3").toString
    val ss = sqlSession(wh)
    ss.sql("CREATE TABLE g.t2 (k BIGINT, v BIGINT)")
    ss.range(20).select($"id".as("k"), ($"id" * 2).as("v"))
      .createOrReplaceTempView("src2")
    ss.sql("INSERT INTO g.t2 SELECT k, v FROM src2")
    // the WriteBuilder deliberately omits SupportsTruncate, so Spark
    // itself refuses the overwrite before any file moves
    val e1 = intercept[Exception](
      ss.sql("INSERT OVERWRITE g.t2 SELECT k, v FROM src2"))
    assert(e1.getMessage.contains("does not support truncate"),
      e1.getMessage)
    // additive ALTER evolves the recorded schema; the new column reads
    // NULL from pre-evolution files
    ss.sql("ALTER TABLE g.t2 ADD COLUMN w DOUBLE")
    assert(ss.sql("SELECT w FROM g.t2").collect().forall(_.isNullAt(0)))
    val e2 = intercept[Exception](ss.sql("ALTER TABLE g.t2 DROP COLUMN v"))
    assert(e2.getMessage.contains("additive"), e2.getMessage)
  }

  test("DELETE FROM lands as one deletion-vector commit; SQL reads are " +
      "merge-on-read (library DVs subtract too); loose predicates refuse") {
    val wh = Files.createTempDirectory("graft-sqlcat4").toString
    val ss = sqlSession(wh)
    ss.sql("CREATE TABLE g.t3 (k BIGINT, v BIGINT)")
    ss.range(40).select($"id".as("k"), ($"id" * 2).as("v"))
      .createOrReplaceTempView("src3")
    ss.sql("INSERT INTO g.t3 SELECT k, v FROM src3")
    val dir = new Path(s"$wh/t3")
    val fs = dir.getFileSystem(ss.sparkContext.hadoopConfiguration)
    val filesBefore = ManifestCommit.currentSnapshot(fs, dir).get.files
    // DELETE through SQL: one positional-sidecar commit, the live file
    // set untouched (O(deleted rows) write amplification)
    ss.sql("DELETE FROM g.t3 WHERE k >= 10 AND k <= 19")
    assert(ManifestCommit.currentSnapshot(fs, dir).get.files
      == filesBefore, "a DV delete must not move data files")
    assert(ManifestCommit.currentDvs(fs, dir).nonEmpty)
    // the SQL read subtracts the sidecar positions inside the readers
    val got = ss.sql("SELECT k FROM g.t3").collect()
      .map(_.getLong(0)).toSet
    assert(got == ((0L to 9L) ++ (20L to 39L)).toSet, s"got=$got")
    // ... and equals the library merge-on-read read bit for bit
    assert(got == ManifestCommit.readTableDV(ss, dir.toString)
      .collect().map(_.getAs[Long]("k")).toSet)
    // a second SQL delete composes with the first's sidecar
    ss.sql("DELETE FROM g.t3 WHERE k = 25")
    assert(ss.sql("SELECT count(*) AS n FROM g.t3").head.getLong(0) == 29L)
    // a predicate the range shape can't express refuses loudly instead
    // of under-deleting
    val e = intercept[Exception](
      ss.sql("DELETE FROM g.t3 WHERE v = 4 OR k = 2"))
    assert(e.getMessage != null)
    assert(ss.sql("SELECT count(*) AS n FROM g.t3").head.getLong(0) == 29L,
      "a refused delete must delete nothing")
  }

  test("writeStream.toTable: epochs land as txn-watermarked manifest " +
      "commits — exactly-once, resumable, no sink metadata log") {
    import org.apache.spark.sql.streaming.Trigger
    val wh = Files.createTempDirectory("graft-sqlcat7").toString
    val ss = sqlSession(wh)
    // a library source lake whose change feed drives the stream
    val src = new Path(s"$wh/srclake")
    val fs = src.getFileSystem(ss.sparkContext.hadoopConfiguration)
    graft.ops.Layout.writeLinear(
      ss.range(60).select($"id".as("k"), ($"id" * 2).as("v")),
      col("k"), src.toString, 2)
    ManifestCommit.bootstrap(fs, src)
    ManifestCommit.recordStats(ss, src, Seq("k"))
    ManifestCommit.recordSchema(ss, src)
    val ckpt = Files.createTempDirectory("graft-sqlcat7-ck").toString
    ss.sql("CREATE NAMESPACE g.db")
    ss.sql("CREATE TABLE g.db.sunk (k BIGINT, v BIGINT)")
    def run(): Unit = ss.readStream
      .format("graft.sources.FeedSource")
      .option("path", src.toString).option("bootstrap", "true")
      .load().select($"k", $"v")
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .toTable("g.db.sunk").awaitTermination()
    run()
    def ks = ss.sql("SELECT k FROM g.db.sunk").collect()
      .map(_.getLong(0)).toSeq.sorted
    assert(ks == (0L to 59L), s"landed ${ks.size} rows")
    // restart against the same checkpoint with nothing new: no batch
    // re-lands, no duplicates
    run()
    assert(ks == (0L to 59L), "an idle restart must append nothing")
    // the source advances; the resumed stream lands exactly the delta,
    // and the sink table's history shows pure appends with the query's
    // txn watermark (no rewrites, no side metadata)
    ManifestCommit.stageAndPublish(ss, src,
      ss.range(5).select(($"id" + 100).as("k"), ($"id" * 2).as("v")),
      _ => true, statsCols = Seq("k")).getOrElse(fail("publish"))
    run()
    assert(ks == ((0L to 59L) ++ (100L to 104L)), s"after delta: $ks")
    val sunk = new Path(s"$wh/db/sunk")
    assert(ManifestCommit.currentTxns(fs, sunk).nonEmpty,
      "the epoch watermark must ride the sink table's manifest")
    val kinds = ManifestCommit.history(ss, sunk).collect()
      .map(r => (r.getString(1), r.getLong(3))).toSeq
    assert(kinds.filter(_._1 == "append").forall(_._2 == 0L),
      s"streaming epochs must be pure appends: $kinds")
    // crash-shaped replay: a manual duplicate epoch commit (same query
    // id, same epoch) must no-op against the watermark
    val before = ManifestCommit.currentSnapshot(fs, sunk).get
    val qid = ManifestCommit.currentTxns(fs, sunk).keys.head
    val lastEpoch = ManifestCommit.currentTxns(fs, sunk)(qid)
    ManifestCommit.appendFiles(fs, sunk, Nil,
      txn = Some((qid, lastEpoch)))
    assert(ManifestCommit.currentSnapshot(fs, sunk).get.version
      == before.version, "a replayed epoch must be a no-op commit")
  }

  test("readStream.table: snapshot-then-tail as an append stream with " +
      "commit-version offsets; a row-mutating commit refuses loudly") {
    import org.apache.spark.sql.streaming.Trigger
    val wh = Files.createTempDirectory("graft-sqlcat8").toString
    val ss = sqlSession(wh)
    ss.sql("CREATE TABLE g.rt (k BIGINT, v BIGINT)")
    ss.range(25).select($"id".as("k"), ($"id" * 2).as("v"))
      .createOrReplaceTempView("src8")
    ss.sql("INSERT INTO g.rt SELECT k, v FROM src8")
    val ckpt = Files.createTempDirectory("graft-sqlcat8-ck").toString
    val seen = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Long]())
    def run(): Unit = ss.readStream.table("g.rt")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("k").collect().foreach(r => seen.add(r.getLong(0)))
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    run()
    def ks = {
      import scala.jdk.CollectionConverters._
      seen.asScala.toSeq.sorted
    }
    assert(ks == (0L to 24L), s"snapshot batch: ${ks.size} rows")
    // new INSERT while the consumer is down: the resumed checkpoint
    // tails exactly the delta (offsets are commit versions)
    ss.sql("INSERT INTO g.rt SELECT k + 100, v FROM src8")
    run()
    assert(ks == ((0L to 24L) ++ (100L to 124L)), s"after tail: $ks")
    // a DV delete lands: the append-only table stream must refuse the
    // retraction, naming the change-feed consumer
    ss.sql("DELETE FROM g.rt WHERE k = 3")
    val e = intercept[Exception](run())
    val msg = Option(e.getCause).fold(e.getMessage)(c =>
      e.getMessage + " " + c.getMessage)
    assert(msg.contains("change feed"), msg)
  }

  test("VERSION AS OF: the pre-delete snapshot reads whole, the schema " +
      "is as recorded then, pinned versions are read-only, and a pruned " +
      "version refuses") {
    val wh = Files.createTempDirectory("graft-sqlcat6").toString
    val ss = sqlSession(wh)
    ss.sql("CREATE TABLE g.tt (k BIGINT, v BIGINT)")
    ss.range(30).select($"id".as("k"), ($"id" * 2).as("v"))
      .createOrReplaceTempView("src6")
    ss.sql("INSERT INTO g.tt SELECT k, v FROM src6")
    val dir = new Path(s"$wh/tt")
    val fs = dir.getFileSystem(ss.sparkContext.hadoopConfiguration)
    val vLoaded = ManifestCommit.currentSnapshot(fs, dir).get.version
    ss.sql("DELETE FROM g.tt WHERE k >= 10 AND k <= 29")
    ss.sql("ALTER TABLE g.tt ADD COLUMN w DOUBLE")
    // live head: 10 rows, 3 columns; pinned version: all 30 rows and
    // NO w column — the schema is the one recorded at that version
    assert(ss.sql("SELECT count(*) AS n FROM g.tt").head.getLong(0) == 10L)
    val old = ss.sql(s"SELECT * FROM g.tt VERSION AS OF $vLoaded")
    assert(old.columns.toSeq == Seq("k", "v"),
      s"later-added columns must not surface: ${old.columns.toSeq}")
    assert(old.count() == 30L)
    // a time-travel read BETWEEN two DV states: delete half the range,
    // travel back across it
    val vAfterDelete = ManifestCommit.currentSnapshot(fs, dir).get.version
    ss.sql("DELETE FROM g.tt WHERE k = 5")
    assert(ss.sql(s"SELECT count(*) AS n FROM g.tt " +
      s"VERSION AS OF $vAfterDelete").head.getLong(0) == 10L)
    assert(ss.sql("SELECT count(*) AS n FROM g.tt").head.getLong(0) == 9L)
    // pinned versions are immutable: writes and deletes refuse
    val e1 = intercept[Exception](ss.sql(
      s"DELETE FROM g.tt VERSION AS OF $vLoaded WHERE k = 1"))
    assert(e1.getMessage != null)
    // a pruned version refuses loudly, naming the horizon
    ManifestCommit.pruneLog(fs, dir, keepLast = 1)
    val e2 = intercept[Exception](
      ss.sql(s"SELECT * FROM g.tt VERSION AS OF $vLoaded").collect())
    assert(e2.getMessage.contains("pruned"), e2.getMessage)
  }

  test("long-range predicates prune FILES via the manifest's recorded " +
      "per-file stats — a key-clustered table scans one file, not all") {
    val wh = Files.createTempDirectory("graft-sqlcat5").toString
    val ss = sqlSession(wh)
    // a key-clustered library table (8 files, recorded stats) read
    // through SQL with a point predicate
    val dir = new Path(s"$wh/clustered")
    graft.ops.Layout.writeLinear(
      ss.range(800).select($"id".as("k"), ($"id" % 7).as("g")),
      col("k"), dir.toString, 8)
    val fs = dir.getFileSystem(ss.sparkContext.hadoopConfiguration)
    ManifestCommit.bootstrap(fs, dir)
    ManifestCommit.recordStats(ss, dir, Seq("k"))
    ManifestCommit.recordSchema(ss, dir)
    val q = ss.sql("SELECT g FROM g.clustered WHERE k = 400")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(400L % 7))
    // the executed scan planned ONE file-partition, not eight: the
    // stats pruning reached the DSv2 scan (leaf partition count == RDD
    // partition count == files planned)
    val scanParts = q.queryExecution.executedPlan.collectLeaves()
      .head.execute().getNumPartitions
    assert(scanParts == 1, s"expected 1 pruned file partition, " +
      s"got $scanParts")
    // recorded blooms close the gap stats leave: a point probe for a
    // value inside a file's [min, max] but absent from the data prunes
    // to ZERO partitions (readTableEq's pruning, behind plain SQL)
    graft.ops.Layout.writeLinear(
      ss.range(100).select(($"id" * 10).as("k"), ($"id" % 7).as("g")),
      col("k"), s"$wh/bloomed", 2)
    val bdir = new Path(s"$wh/bloomed")
    ManifestCommit.bootstrap(fs, bdir)
    ManifestCommit.recordStats(ss, bdir, Seq("k"))
    ManifestCommit.recordSchema(ss, bdir)
    ManifestCommit.recordBlooms(ss, bdir, "k")
    val q2 = ss.sql("SELECT g FROM g.bloomed WHERE k = 15") // in range, absent
    assert(q2.collect().isEmpty)
    val parts2 = q2.queryExecution.executedPlan.collectLeaves()
      .head.execute().getNumPartitions
    assert(parts2 == 0,
      s"a bloom-rejected point probe must plan zero files, got $parts2")
  }
}
