package graft
import org.apache.spark.sql.SparkSession

/** Local optimization-loop timer: run NAMED queries with exactly the
  * Bench methodology (same session config, warm-up, min-of-2 with
  * cache-clear between runs) so per-query before/after numbers are
  * comparable to full Bench captures without paying the full 288-query
  * wall time. Usage:
  *   SPARK_GRAFT_CPUS=32 runMain graft.BenchSome q189_prefix_join [q...]
  * Optionally `-rN` as the first arg: keep the min of N runs (default 2).
  * The driver contract lives in Bench — this main is measurement-only
  * and is never invoked by the driver. */
object BenchSome {
  private def readLoadavg: String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split(" ").take(3).mkString(" ")
    catch { case _: Throwable => "" }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = args.headOption.filter(_.startsWith("-r"))
      .map(_.drop(2).toInt).getOrElse(2)
    val names = args.dropWhile(_.startsWith("-r")).toSeq
    require(names.nonEmpty, "usage: BenchSome [-rN] <query> [query ...]")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        session: SparkSession = spark): Double = {
      val t0 = System.nanoTime()
      val ok = try { fn(session, sfDir).count(); true }
        catch { case t: Throwable =>
          System.err.println(s"bench query failed: ${t.getClass.getName}: ${t.getMessage}")
          false }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      if (ok) dt else -1.0
    }
    val freshSession = Set("q35_ta_pipeline")
    println(s"loadavg_start ${readLoadavg}")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (0 until runs).map { i =>
        if (i > 0 && freshSession(name)) {
          val s2 = spark.newSession()
          s2.conf.set("spark.sql.shuffle.partitions", cpus)
          once(fn, s2)
        } else once(fn)
      }
      val best = if (times.exists(_ < 0)) -1.0 else times.min
      println(f"[benchsome] $name%-28s min=$best%8.3f  runs=" +
        times.map(t => f"$t%.3f").mkString(","))
    }
    println(s"loadavg_end ${readLoadavg}")
    spark.stop()
  }
}
