package graft

import org.apache.spark.sql.SparkSession

/** Two-process durability drive for the persistent catalog — the
  * reference's Athena/Glue contract (create-athena-views-lambda.py:84-86:
  * `CREATE OR REPLACE VIEW` persists in Glue and survives every future
  * session). `write` builds the lake + persistent tables + persistent
  * (`temporary = false`) views against a Hive/derby metastore and exits;
  * `read` is a BRAND-NEW JVM whose only state is the warehouse +
  * metastore on disk — it must see the tables AND the views cold,
  * without any registration replay. Orchestrated by
  * [[TaPipelineSpec]]'s restart test (same JVM would double-boot derby;
  * separate processes are the honest restart). */
object CatalogRestartMain {
  def main(args: Array[String]): Unit = {
    val Array(mode, warehouse, lakeRoot, metastore) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-restart-$mode")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.sql.catalogImplementation", "hive")
      .config("spark.hadoop.javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$metastore/metastore_db;create=true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      if (mode == "write") {
        val accounts = (1 to 2).map(i =>
          f"${100000000000L + i}%012d:Account $i:a$i@example.com").mkString(",")
        val raw = spark.read.format("graft.sources.TaCheckResultSource")
          .option("accounts", accounts)
          .option("checks",
            graft.model.CheckRegistry.supported.map(_.id).mkString(","))
          .option("date", "01-15-2024")
          .option("datetime", "2024-01-15 10:00:00")
          .load()
        val created = graft.jobs.Pipeline.run(spark, raw, None,
          graft.jobs.Pipeline.Config(lakeRoot, persistentCatalog = true))
        println(s"WRITE_OK views=${created.size}")
      } else {
        // COLD catalog: nothing registered in this JVM — everything must
        // come back from the shared metastore + lake alone
        require(spark.catalog.tableExists("check_qch7dwoux1"),
          "check table missing after restart")
        require(spark.catalog.tableExists("summary"),
          "summary table missing after restart")
        val view = "LowUtilizationAmazonEC2Instances_view"
        require(spark.catalog.tableExists(view), "view missing after restart")
        val tt = spark.catalog.getTable(view).tableType
        require(tt == "VIEW", s"expected persistent VIEW, got $tt")
        val n = spark.table(view).count()
        require(n > 0, "view returned no rows after restart")
        require(spark.table("summary_view").count() > 0,
          "summary_view returned no rows after restart")
        // the view's derived columns evaluate (money parse etc.), proving
        // the stored view TEXT survived, not just the name
        val sav = spark.table(view)
          .select("estimated_monthly_savings").limit(1).collect()
        require(sav.nonEmpty && sav.head.get(0) != null,
          "derived column must evaluate from the stored view definition")
        println(s"RESTART_OK rows=$n")
      }
    } finally spark.stop()
  }
}
