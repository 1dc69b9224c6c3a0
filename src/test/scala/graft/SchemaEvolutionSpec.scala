package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.lake.Lake

/** Negative halves of the crawler schema-evolution contract (r4 verdict
  * item 6). The ADDITIVE half (new tag columns union in, dropped keys
  * read null — UPDATE_IN_DATABASE) is pinned by TaPipelineSpec's dynamic
  * tag schema test; these pin the conflict classes:
  *   - type conflict across runs → loud error at registration (parquet
  *     resolves by name; a silently coerced or nulled column would be
  *     data corruption),
  *   - csvFidelity column-set drift → refused at WRITE time (CSV reads
  *     positionally; an appended run with different columns would
  *     misalign every later column),
  *   - vanished lake data → catalog entry dropped on refresh, the
  *     crawler's DELETE_FROM_DATABASE (template:3186-3188).
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal tags-shaped rows (the lake's only mergeSchema table). */
  private def tagRows(day: String, ccCol: org.apache.spark.sql.Column) =
    Seq(("res-1")).toDF("resourceid")
      .withColumn("datetime", lit(s"2024-01-$day 09:00:00"))
      .withColumn("costcenter", ccCol)
      .withColumn("date", lit(s"01-$day-2024"))

  test("type conflict across runs fails loudly at registration, never silent nulls") {
    val root = Files.createTempDirectory("graft-typeconflict").toString
    Lake.writeTags(tagRows("15", lit("cc-123")), root)          // string
    Lake.writeTags(tagRows("16", lit(42L)), root)               // bigint
    val e = intercept[Exception] {
      Lake.registerTables(spark, root, Nil, tagsPresent = true)
      spark.table("tags").collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(e).toLowerCase.contains("merge") ||
      messages(e).toLowerCase.contains("incompatible"),
      s"expected a schema-merge failure, got: ${messages(e)}")
  }

  test("csvFidelity: an append that changes the tag column set is refused at write") {
    val root = Files.createTempDirectory("graft-csvdrift").toString
    Lake.writeTags(tagRows("15", lit("cc-123")), root, csvFidelity = true)
    // same data, one column renamed — positional CSV would misalign
    val drifted = tagRows("16", lit("cc-456"))
      .withColumnRenamed("costcenter", "costcentre")
    val e = intercept[IllegalArgumentException] {
      Lake.writeTags(drifted, root, csvFidelity = true)
    }
    assert(e.getMessage.contains("column set"))
    // the refusal left the table intact and readable
    Lake.registerTables(spark, root, Nil, tagsPresent = true, csvFidelity = true)
    assert(spark.table("tags").count() == 1)
    spark.catalog.dropTempView("tags")
  }

  test("DELETE_FROM_DATABASE: vanished lake data drops the catalog entry on refresh") {
    val root = Files.createTempDirectory("graft-delete").toString
    val spec = graft.model.CheckRegistry.lowUtilEc2
    // another suite may have left PERSISTENT tables under these names in
    // the shared session's catalog; clear them so tableExists probes
    // observe only this test's registrations
    Seq(spec.tableName, "summary", "tags").foreach(n =>
      spark.sql(s"DROP TABLE IF EXISTS `$n`"))
    // details + tags present -> both register
    val details = Seq(("i-1", "ok")).toDF("instance id", "status")
      .withColumn("date", lit("01-15-2024"))
      .withColumn("datetime", lit("2024-01-15 09:00:00"))
    details.write.parquet(Lake.detailsPath(root, spec) +
      "/year=2024/month=1/day=15")
    Lake.writeTags(tagRows("15", lit("cc-1")), root)
    val t1 = Lake.registerTables(spark, root, Seq(spec), tagsPresent = true)
    assert(t1.toSet == Set(spec.tableName, "tags"))
    assert(spark.catalog.tableExists("tags"))
    // the Tags prefix is deleted from the lake; refresh must drop the
    // catalog entry (temp-view mode), not keep serving the stale relation
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(Lake.tagsPath(root)), true)
    val t2 = Lake.registerTables(spark, root, Seq(spec), tagsPresent = true)
    assert(t2.toSet == Set(spec.tableName))
    assert(!spark.catalog.tableExists("tags"),
      "stale catalog entry must be dropped when its data vanished")

    // persistent mode: same contract against the durable catalog
    try {
      Lake.registerTables(spark, root, Seq(spec), tagsPresent = true,
        persistent = true)
      assert(spark.catalog.tableExists(spec.tableName))
      fs.delete(new org.apache.hadoop.fs.Path(
        Lake.detailsPath(root, spec)), true)
      Lake.registerTables(spark, root, Seq(spec), tagsPresent = true,
        persistent = true)
      assert(!spark.catalog.tableExists(spec.tableName),
        "persistent table must be dropped when its data vanished")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS `${spec.tableName}`")
      spark.sql("DROP TABLE IF EXISTS `summary`")
      spark.sql("DROP TABLE IF EXISTS `tags`")
    }
  }
}
