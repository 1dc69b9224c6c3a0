package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen paths once on the smallest SF so per-query
    // numbers measure the engine, not first-call JIT + planning warm-up.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // Returns elapsed seconds, or -1.0 when the query threw: a broken query
    // must surface as a failure sentinel, never as a (near-zero) speedup.
    def once(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case t: Throwable =>
          System.err.println(s"bench query failed: ${t.getClass.getName}: ${t.getMessage}")
          false }
      val dt = (System.nanoTime() - t0) / 1e9
      // release per-query persisted relations so queries don't degrade
      // each other through leftover storage memory
      spark.catalog.clearCache()
      if (ok) dt else -1.0
    }
    // The host VM shows multi-x run-to-run noise (see BASELINE.md):
    // re-measure each query and keep the min, so one contended scheduling
    // window (or first-call codegen warm-up — ~half the cold time of the
    // multi-stage dedup queries) doesn't masquerade as the query's cost.
    // Exceptions: q35 memoizes its lake across invocations, so a rerun
    // would be warm-but-wrong — it must report its COLD cost and stays
    // single-run; and a first run slower than 30 s is not rerun, so a
    // catastrophically contended window doesn't double the damage.
    val noRerun = Set("q35_ta_pipeline")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val first = once(fn)
      name -> (if (first >= 0 && first < 30.0 && !noRerun(name))
        math.min(first, once(fn)) else first)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => s"\"$k\"" }
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}""")
    spark.stop()
  }
}
