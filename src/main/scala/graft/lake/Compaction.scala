package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Multi-day small-file compaction for the partitioned lake.
  *
  * The lake's writers append one run per day (Lake.write: REBALANCE keeps
  * each run's file count low), but the reference's monthly cadence over
  * years — or the streaming ingest's per-micro-batch appends
  * (Pipeline.ingestStream) — still accretes many small files per y/m/d
  * partition, and at 100 TB the scan's task count (and the namenode/S3
  * LIST cost) is governed by file count, not byte count. This operator
  * rewrites each over-fragmented partition into target-sized files.
  *
  * Scale design: the driver only LISTs partition directories (metadata,
  * proportional to partition count); each selected partition is rewritten
  * by one Spark write whose task count comes from the partition's actual
  * bytes. Partitions already at/below the file-count target are untouched
  * — steady-state compaction cost tracks the fragmented tail, not the
  * table size. The swap is two directory renames (stage in, old out), so
  * readers never see a mix of old and new files; the brief absent-window
  * between renames matches the reference's own crawler-refresh semantics
  * (run it in the catalog-refresh maintenance slot, template:22-26).
  */
object Compaction {

  final case class Report(partition: String, filesBefore: Int, filesAfter: Int)

  private def isDataFile(p: Path): Boolean = {
    val n = p.getName
    !n.startsWith("_") && !n.startsWith(".")
  }

  /** Leaf partition directories (year=.../month=.../day=...) under `root`. */
  private def leafDirs(fs: FileSystem, root: Path): Seq[Path] = {
    def walk(dir: Path): Seq[Path] = {
      // skip hidden dirs: a crashed compaction's ._compacting/._retired
      // leftovers must never be taken for partitions
      val children = fs.listStatus(dir).filter(_.isDirectory)
        .map(_.getPath).filter(p => isDataFile(p))
      if (children.isEmpty) Seq(dir)
      else children.toIndexedSeq.flatMap(walk)
    }
    if (fs.exists(root)) walk(root).filter(_.getName.startsWith("day="))
    else Nil
  }

  /** Compact every y/m/d partition of `tablePath` that holds more than
    * `maxFiles` data files, rewriting it into
    * ceil(bytes / targetFileBytes) files. Returns one Report per
    * rewritten partition. Parquet only (the CSV-fidelity lake reproduces
    * reference bytes and is left exactly as written). */
  def compactTable(spark: SparkSession, tablePath: String,
      maxFiles: Int = 4, targetFileBytes: Long = 128L * 1024 * 1024): Seq[Report] = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    leafDirs(fs, root).flatMap { dir =>
      val files = fs.listStatus(dir).map(_.getPath).filter(isDataFile)
      if (files.length <= maxFiles) None
      else {
        val bytes = files.map(fs.getFileStatus(_).getLen).sum
        val nOut = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
        // dot-prefixed: Spark's file index and our own partition walk both
        // ignore hidden dirs, so a crash mid-swap can't surface staged or
        // retired files as a bogus day=... partition
        val staged = new Path(dir.getParent, "." + dir.getName + ".compacting")
        val retired = new Path(dir.getParent, "." + dir.getName + ".retired")
        fs.delete(staged, true); fs.delete(retired, true)
        // rewrite the partition's rows only — no partition columns in a
        // leaf dir, so the files drop back in place schema-identically
        spark.read.parquet(dir.toString)
          .repartition(nOut)
          .write.parquet(staged.toString)
        // atomic-enough swap: two renames, no old/new mixing
        require(fs.rename(dir, retired), s"compaction: cannot retire $dir")
        require(fs.rename(staged, dir), s"compaction: cannot swap in $staged")
        fs.delete(retired, true)
        val after = fs.listStatus(dir).map(_.getPath).count(isDataFile)
        Some(Report(dir.toString, files.length, after))
      }
    }
  }

  /** Compact every check/summary/tags table of a lake root. */
  def compactLake(spark: SparkSession, lakeRoot: String,
      maxFiles: Int = 4, targetFileBytes: Long = 128L * 1024 * 1024): Seq[Report] = {
    val root = new Path(lakeRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // table roots: <root>/TA-Reports/<category>/<table>, <root>/Tags
    val reports = new Path(root, "TA-Reports")
    val tableDirs =
      (if (fs.exists(reports))
        fs.listStatus(reports).filter(_.isDirectory).flatMap(cat =>
          fs.listStatus(cat.getPath).filter(_.isDirectory).map(_.getPath))
      else Array.empty[Path]) ++
      Some(new Path(root, "Tags")).filter(fs.exists(_))
    tableDirs.toIndexedSeq.flatMap(t =>
      compactTable(spark, t.toString, maxFiles, targetFileBytes))
  }
}
