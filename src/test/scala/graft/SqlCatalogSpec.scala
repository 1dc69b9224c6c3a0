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

  test("refusals stay loud: INSERT OVERWRITE, non-additive ALTER, and " +
      "a bare SQL scan of a DV-carrying table") {
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
    // a DV-carrying table refuses the bare scan, naming the repair
    val dir = new Path(s"$wh/t2")
    ManifestCommit.deleteWhereDV(ss, dir, "k", 3L, 7L)
    val e3 = intercept[Exception](ss.sql("SELECT * FROM g.t2").collect())
    assert(e3.getMessage.contains("readTableDV"), e3.getMessage)
    // the library merge-on-read path still serves the rows
    assert(ManifestCommit.readTableDV(ss, dir.toString).count() == 15L)
  }
}
