package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Z-order layout: interleave correctness, quantize bounds, and the
  * payoff claim itself — a second-dimension predicate prunes files under
  * the Z-order layout and cannot prune under a linear sort. */
class LayoutSpec extends SparkSpec {

  test("zValue interleaves bits (hand-computed)") {
    import spark.implicits._
    // x=0b101 (5), y=0b011 (3), bits=3:
    // z = x2 y2 x1 y1 x0 y0 = 1 0 0 1 1 1 = 0b100111 = 39
    val df = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 3).as("z"))
    assert(df.head.getLong(0) === 39L)
    // full 8-bit corners
    val c = Seq((0L, 0L), (255L, 255L), (255L, 0L), (0L, 255L))
      .toDF("x", "y").select(Layout.zValue(col("x"), col("y"), 8).as("z"))
      .collect().map(_.getLong(0))
    assert(c(0) === 0L)
    assert(c(1) === 65535L)
    assert(c(2) === 43690L) // 0b1010101010101010
    assert(c(3) === 21845L) // 0b0101010101010101
  }

  test("zValue locality: adjacent cells share high bits") {
    import spark.implicits._
    // points in the same 2x2 cell differ only in the lowest 2 z-bits
    val z = Seq((10L, 20L), (11L, 20L), (10L, 21L), (11L, 21L))
      .toDF("x", "y").select(Layout.zValue(col("x"), col("y"), 8).as("z"))
      .collect().map(_.getLong(0))
    assert(z.map(_ >> 2).distinct.length === 1)
    assert(z.distinct.length === 4)
  }

  test("quantize maps bounds to [0, 2^bits) and clamps outliers") {
    import spark.implicits._
    val df = Seq(100L, 1099L, 600L, 50L, 2000L).toDF("v")
      .select(Layout.quantize(col("v"), 100L, 1099L, 4).as("q"))
    val q = df.collect().map(_.getLong(0))
    assert(q(0) === 0L)   // lo -> first bucket
    assert(q(1) === 15L)  // hi -> last bucket
    assert(q(2) === 8L)   // midpoint
    assert(q(3) === 0L)   // below lo clamps
    assert(q(4) === 15L)  // above hi clamps
  }

  test("Z-order prunes a second-dimension predicate; linear cannot") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("layout_spec").toString
    // 64k points on a 256x256 grid, both dims uniform
    val pts = spark.range(65536)
      .select((col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
    val nFiles = 32
    Layout.writeLinear(pts, col("x"), s"$tmp/linear", nFiles)
    Layout.writeZOrdered(pts, col("x"), col("y"), 8, s"$tmp/zorder", nFiles)
    // y-only box: 1/8 of the y domain, all of x
    val yRange = Map("y" -> (0L, 31L))
    val lin = Layout.fileColumnStats(spark, s"$tmp/linear", Seq("x", "y"))
    val zo = Layout.fileColumnStats(spark, s"$tmp/zorder", Seq("x", "y"))
    val linFiles = lin.map(_._1).distinct.size
    val zoFiles = zo.map(_._1).distinct.size
    assert(linFiles === nFiles && zoFiles === nFiles)
    val linTouched = Layout.prunedFiles(lin, yRange).size
    val zoTouched = Layout.prunedFiles(zo, yRange).size
    // linear layout sorted on x: every file spans the whole y domain
    assert(linTouched === nFiles)
    // z-order: files are rectangles, only those intersecting y<32 remain
    assert(zoTouched <= nFiles / 2,
      s"z-order should prune: touched $zoTouched of $nFiles")
    // and the pruned set is sufficient: reading only those files yields
    // exactly the predicate's rows
    val keep = Layout.prunedFiles(zo, yRange)
      .map(f => s"$tmp/zorder/$f")
    val got = spark.read.parquet(keep: _*)
      .filter(col("y") <= 31).count()
    assert(got === 65536L / 8)
  }

  test("hidden day-partitioning prunes partitions from a TIME predicate") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("layout_day").toString
    val day = 86400000000L
    // 30 days of microsecond timestamps
    val df = spark.range(3000)
      .select($"id", ($"id" % 30 * day + $"id").as("ts_us"))
    Layout.writeDayPartitioned(df, col("ts_us"), s"$tmp/t")
    // a 3-day window
    val got = Layout.readDayRange(spark, s"$tmp/t", "ts_us",
      5 * day, 8 * day - 1)
    assert(got.count() == 300L)
    // partition pruning is visible in the plan AND in the files touched
    val plan = got.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") && plan.contains("__day"),
      s"day range must prune partitions:\n$plan")
    // the executed scan reads only the 3 selected day partitions'
    // files (inputFiles reflects the unpruned listing — the scan
    // metric is the pruned truth)
    val scan = got.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    val total = spark.read.parquet(s"$tmp/t").inputFiles.length
    assert(scan.metrics("numFiles").value < total / 5,
      s"scan read ${scan.metrics("numFiles").value} of $total files")
    // boundary exactness: the row predicate finishes partial days
    val partial = Layout.readDayRange(spark, s"$tmp/t", "ts_us",
      5 * day + 10, 6 * day - 1)
    assert(partial.count() ==
      df.filter($"ts_us".between(5 * day + 10, 6 * day - 1)).count())
  }

  test("x-predicate still prunes under Z-order (both dims work)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("layout_spec2").toString
    val pts = spark.range(65536)
      .select((col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
    Layout.writeZOrdered(pts, col("x"), col("y"), 8, s"$tmp/zorder", 32)
    val zo = Layout.fileColumnStats(spark, s"$tmp/zorder", Seq("x", "y"))
    val touched = Layout.prunedFiles(zo, Map("x" -> (0L, 31L))).size
    assert(touched <= 16, s"x-range should prune too: $touched of 32")
  }
}
