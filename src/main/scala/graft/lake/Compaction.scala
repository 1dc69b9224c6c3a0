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

  /** Leaf partition directories (year=.../month=.../day=...) under `root`,
    * including partitions that currently exist ONLY as a crashed run's
    * hidden .day=N.retired / .day=N.compacting leftovers — those name the
    * partition they belong to and must surface so recover() can restore
    * it. Hidden dirs themselves are never treated as partitions. */
  private def leafDirs(fs: FileSystem, root: Path): Seq[Path] = {
    def walk(dir: Path): Seq[Path] = {
      val children = fs.listStatus(dir).filter(_.isDirectory).map(_.getPath)
      val visible = children.filter(isDataFile)
      val interrupted = children.filterNot(isDataFile).flatMap { p =>
        val n = p.getName
        if (n.startsWith(".") &&
            (n.endsWith(".compacting") || n.endsWith(".retired")))
          Some(new Path(dir, n.substring(1, n.lastIndexOf('.'))))
        else None
      }
      if (visible.isEmpty && interrupted.isEmpty) Seq(dir)
      else visible.toIndexedSeq.flatMap(walk) ++ interrupted
    }
    if (fs.exists(root))
      walk(root).distinct.filter(_.getName.startsWith("day="))
    else Nil
  }

  /** Recover a partition from an interrupted previous compaction run.
    * The swap sequence is: stage -> rename(dir, retired) ->
    * rename(staged, dir) -> delete(retired). Each crash point leaves a
    * distinguishable state: if the live dir exists, any leftover
    * staged/retired dirs are incomplete/already-copied artifacts — delete
    * them; if the live dir is GONE, the retired dir holds the only copy of
    * the data — rename it back before doing anything else. */
  private def recover(fs: FileSystem, dir: Path): Unit = {
    val staged = new Path(dir.getParent, "." + dir.getName + ".compacting")
    val retired = new Path(dir.getParent, "." + dir.getName + ".retired")
    if (!fs.exists(dir) && fs.exists(retired))
      require(fs.rename(retired, dir),
        s"compaction recovery: cannot restore $retired to $dir")
    fs.delete(staged, true)
    if (fs.exists(dir)) fs.delete(retired, true)
  }

  /** Compact every y/m/d partition of `tablePath` that holds more than
    * `maxFiles` parquet data files, rewriting it into
    * ceil(bytes / targetFileBytes) files. Returns one Report per
    * rewritten partition. Parquet only — partitions without .parquet data
    * files (the CSV-fidelity lake reproduces reference bytes and must be
    * left exactly as written) are skipped, not corrupted. Also restores
    * any partition a previously crashed run left mid-swap. */
  def compactTable(spark: SparkSession, tablePath: String,
      maxFiles: Int = 4, targetFileBytes: Long = 128L * 1024 * 1024): Seq[Report] = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    leafDirs(fs, root).flatMap { dir =>
      recover(fs, dir)
      val files =
        if (fs.exists(dir)) fs.listStatus(dir).filter(s => isDataFile(s.getPath))
        else Array.empty[org.apache.hadoop.fs.FileStatus]
      if (files.length <= maxFiles ||
          !files.forall(_.getPath.getName.endsWith(".parquet"))) None
      else {
        val bytes = files.map(_.getLen).sum
        val nOut = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
        // dot-prefixed: Spark's file index and our own partition walk both
        // ignore hidden dirs, so a crash mid-swap can't surface staged or
        // retired files as a bogus day=... partition
        val staged = new Path(dir.getParent, "." + dir.getName + ".compacting")
        val retired = new Path(dir.getParent, "." + dir.getName + ".retired")
        // rewrite the partition's rows only — no partition columns in a
        // leaf dir, so the files drop back in place. mergeSchema: a
        // partition whose appends evolved the schema (the tags table's
        // changing CustomerKeys) must keep the UNION of columns — a
        // single-footer inference would silently drop the others' columns
        spark.read.option("mergeSchema", "true").parquet(dir.toString)
          .repartition(nOut)
          .write.parquet(staged.toString)
        // atomic-enough swap: two renames, no old/new mixing; a crash at
        // any point is undone by recover() on the next run
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
