package graft.sources

import java.util

import scala.jdk.CollectionConverters._
import scala.util.Try

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.lake.ManifestCommit

/** TABLE-level DataSourceV2 micro-batch streaming source over a
  * (possibly Hive-partitioned) manifest lake — ONE source whose
  * **offset is the per-leaf version vector**: a JSON map from each leaf
  * partition's root-relative path to its consumed commit version.
  * The streaming twin of [[graft.lake.ChangeFeed.changeFeedTable]],
  * replacing the union-of-N-per-leaf-[[FeedSource]]s shape (which fixed
  * its source set at query start and had to REFUSE leaves born after
  * the bookmark — a date-partitioned lake births a leaf every rollover,
  * forcing a consumer restart per day).
  *
  *  - **Planning enumerates leaves every round.** `latestOffset` walks
  *    the table root for leaf partitions (one driver-side listing +
  *    one manifest GET per leaf — O(leaves), no Spark job) and emits
  *    the advanced vector. A leaf BORN between micro-batches appears in
  *    the end vector with no entry in the start vector, and its first
  *    batch replays the leaf's committed snapshot at its birth version
  *    as `insert` rows (active deletion vectors subtracted — the same
  *    bootstrap batch the per-leaf source plans), exactly as the batch
  *    `changeFeedTable` replays born leaves. No restart, no incomplete
  *    feed.
  *  - **Per-leaf micro-batch planning is shared** with the per-leaf
  *    source ([[FeedPlanner.planLeafRange]]): zero Spark jobs on every
  *    path, DV positions loaded executor-side, the conservative
  *    refusals (pre-kind commits, predicate-less deletes) inherited.
  *  - **Partition columns ride typed**: each leaf's `col=value` path
  *    segments are decoded with inferred types (int → long → double →
  *    date → string, mirroring Spark's own partition-column inference
  *    for the basePath reads of the batch twin) and appended to every
  *    row via a constant per-partition [[JoinedRow]] — so a
  *    `region=us/dt=2024-01-01` layout streams as naturally as
  *    `day=3`.
  *  - A leaf REMOVED from the listing (dropped partition) keeps its
  *    vector entry frozen: its range is empty forever and it plans
  *    nothing, so checkpointed offsets stay monotone.
  *
  * Usage:
  * {{{
  * spark.readStream.format("graft.sources.TableFeedSource")
  *   .option("path", tableRoot)
  *   .option("cursors", """{"day=1":3,"day=2":1}""") // consumer bookmark
  *   .load()                                         // default: tail heads
  * }}}
  *
  * `maxCommitsPerBatch` throttles each leaf independently (a born
  * leaf's snapshot replay is one atomic version either way). Schema =
  * union of the leaves' recorded data schemas (additive evolution
  * surfaces NULL from pre-evolution files, as everywhere else) +
  * `_change_type` + `_commit_version` + the partition columns. */
class TableFeedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TableFeedSource.fullSchema(options.get("path"))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      props: util.Map[String, String]): Table =
    new TableFeedTable(props.asScala.toMap, schema)
}

object TableFeedSource {

  /** Filesystem schemes whose "directories" are prefix illusions with
    * no meaningful modification time — the root-`_SUCCESS`-vs-leaf-
    * mtime adoption proof is unsound there, so log-less leaves on
    * these schemes wait for a leaf-local marker instead. */
  private[graft] val NoDirMtimeSchemes: Set[String] =
    Set("s3", "s3a", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs",
      "oss", "cos", "swift")

  /** Root-relative paths of the table's leaf partitions ("." for an
    * unpartitioned root): a leaf is a directory with no visible
    * `col=value` child — the general Hive walk, one driver-side listing
    * per interior directory, no name allow-list. */
  private[graft] def leafRels(fs: FileSystem, root: Path): Seq[String] = {
    val qRoot = fs.makeQualified(root).toString
    def rel(dir: Path): String =
      fs.makeQualified(dir).toString.stripPrefix(qRoot)
        .stripPrefix("/") match {
        case ""  => "."
        case p   => p
      }
    def partChildren(dir: Path): Seq[Path] =
      fs.listStatus(dir).toIndexedSeq.filter(_.isDirectory).map(_.getPath)
        .filter { p =>
          val n = p.getName
          !n.startsWith(".") && !n.startsWith("_") && n.contains("=")
        }
    def walk(dir: Path): Seq[Path] = partChildren(dir) match {
      case Seq() => Seq(dir)
      case kids  => kids.flatMap(walk)
    }
    if (!fs.exists(root)) Nil else walk(root).map(rel).sorted
  }

  /** The `col=value` segments of a leaf's relative path, in order. */
  private def segmentsOf(rel: String): Seq[(String, String)] =
    if (rel == ".") Nil
    else rel.split("/").toSeq.filter(_.nonEmpty).map { seg =>
      val i = seg.indexOf('=')
      require(i > 0, s"graft-tablefeed: path segment '$seg' is not a " +
        "col=value Hive partition segment")
      (seg.substring(0, i), seg.substring(i + 1))
    }

  /** Partition-column schema inferred from the leaf paths — the same
    * narrowing ladder Spark's partition inference applies for the batch
    * twin's basePath reads: all-int → int, all-long → long, all-double
    * → double, all-ISO-date → date, else string. Every leaf must carry
    * the same column sequence (standard Hive layout). */
  private[graft] def partitionSchema(rels: Seq[String]): StructType = {
    val segs = rels.map(segmentsOf)
    val cols = segs.headOption.getOrElse(Nil).map(_._1)
    segs.foreach { s =>
      require(s.map(_._1) == cols,
        s"graft-tablefeed: inconsistent partition columns across " +
          s"leaves: ${s.map(_._1).mkString("/")} vs ${cols.mkString("/")}")
    }
    StructType(cols.zipWithIndex.map { case (c, i) =>
      val vs = segs.map(_(i)._2)
      val t: DataType =
        if (vs.forall(v => Try(v.toInt).isSuccess)) IntegerType
        else if (vs.forall(v => Try(v.toLong).isSuccess)) LongType
        else if (vs.forall(v => Try(v.toDouble).isSuccess)) DoubleType
        else if (vs.forall(v =>
          Try(java.time.LocalDate.parse(v)).isSuccess)) DateType
        else StringType
      StructField(c, t, nullable = false)
    })
  }

  /** One leaf path's partition values decoded against the inferred
    * schema — loud on a value the inferred type cannot carry (a leaf
    * born after inference with an incompatible value must fail the
    * batch, not corrupt a column). */
  private[graft] def partitionRow(rel: String,
      partSchema: StructType): InternalRow = {
    val vals = segmentsOf(rel).zip(partSchema.fields).map {
      case ((c, v), f) =>
        require(c == f.name, s"graft-tablefeed: leaf '$rel' has " +
          s"partition column '$c' where '${f.name}' was inferred")
        try f.dataType match {
          case IntegerType => v.toInt
          case LongType    => v.toLong
          case DoubleType  => v.toDouble
          case DateType    =>
            java.time.LocalDate.parse(v).toEpochDay.toInt
          case _           => UTF8String.fromString(v)
        } catch {
          case e: Exception => sys.error(
            s"graft-tablefeed: partition value '$v' of leaf '$rel' " +
              s"does not fit the inferred ${f.dataType} for column " +
              s"'${f.name}' — ${e.getMessage}")
        }
    }
    new GenericInternalRow(vals.toArray[Any])
  }

  /** Union of the leaves' data schemas, fields in first-seen order —
    * an additive mid-table evolution widens the feed schema and
    * pre-evolution files surface NULL, as in the batch twin's
    * allowMissingColumns union. */
  private def unionDataSchema(root: String, rels: Seq[String],
      fs: FileSystem): StructType = {
    require(rels.nonEmpty,
      s"graft-tablefeed: no leaf partitions under $root")
    val fields = scala.collection.mutable.LinkedHashMap[String, StructField]()
    rels.foreach { rel =>
      val leaf = if (rel == ".") root else s"$root/$rel"
      val data = ManifestCommit.currentSchema(fs, new Path(leaf))
        .getOrElse(ManifestCommit
          .readTableRaw(SparkSession.active, leaf).schema)
      data.fields.foreach { f =>
        fields.get(f.name) match {
          case None => fields(f.name) = f
          case Some(prev) => require(prev.dataType == f.dataType,
            s"graft-tablefeed: column '${f.name}' is ${prev.dataType} " +
              s"in one leaf and ${f.dataType} in '$rel' — leaves of " +
              "one table must agree on shared column types")
        }
      }
    }
    StructType(fields.values.toSeq)
  }

  private[sources] def fullSchema(path: String): StructType = {
    require(path != null, "graft-tablefeed: 'path' option is required")
    val root = new Path(path)
    val fs = root.getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)
    val rels = leafRels(fs, root)
    val data = unionDataSchema(path, rels, fs)
    StructType((data.fields.toSeq :+
      StructField(FeedSource.ChangeTypeCol, StringType, nullable = false) :+
      StructField(FeedSource.VersionCol, LongType, nullable = false)) ++
      partitionSchema(rels).fields)
  }

  /** Parse a `{"rel":version}` cursors/offset map (the values are the
    * only numbers in the object, so one pair-regex suffices). Keys are
    * JSON-unescaped — the inverse of [[vectorJson]]'s escaping, so a
    * partition value carrying `"` or `\` round-trips the checkpoint. */
  private[graft] def parseVector(json: String): Map[String, Long] =
    """"((?:[^"\\]|\\.)*)"\s*:\s*(-?\d+)""".r.findAllMatchIn(json)
      .map(m => unescapeKey(m.group(1)) -> m.group(2).toLong).toMap

  private def escapeKey(k: String): String =
    k.replace("\\", "\\\\").replace("\"", "\\\"")
  private def unescapeKey(k: String): String = {
    val sb = new StringBuilder(k.length)
    var i = 0
    while (i < k.length) {
      if (k.charAt(i) == '\\' && i + 1 < k.length) i += 1
      sb.append(k.charAt(i)); i += 1
    }
    sb.toString
  }

  private[graft] def vectorJson(m: Map[String, Long]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${escapeKey(k)}":$v""" }
      .mkString("{", ",", "}")

  /** Serialize a consumer bookmark for the `cursors` option. */
  def cursorsJson(m: Map[String, Long]): String = vectorJson(m)
}

private[sources] class TableFeedTable(props: Map[String, String],
    tableSchema: StructType) extends Table with SupportsRead {
  override def name(): String = s"graft_tablefeed(${props("path")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TableFeedScan(options.get("path"),
      Option(options.get("cursors")).map(TableFeedSource.parseVector),
      Option(options.get("maxCommitsPerBatch")).map(_.toLong), tableSchema,
      Option(options.get("lease")),
      options.getLong("leaseTtlMs", 600000L))
}

private[sources] class TableFeedScan(root: String,
    cursors: Option[Map[String, Long]], maxCommitsPerBatch: Option[Long],
    tableSchema: StructType, lease: Option[String] = None,
    leaseTtlMs: Long = 600000L) extends ScanBuilder with Scan {
  override def build(): Scan = this
  override def readSchema(): StructType = tableSchema
  override def description(): String = s"graft-tablefeed $root"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new TableFeedStream(root, cursors, maxCommitsPerBatch, tableSchema,
      lease, leaseTtlMs)
}

/** The stream offset: one consumed commit version per leaf partition. */
private[graft] case class TableFeedOffset(leaves: Map[String, Long])
    extends Offset {
  override def json(): String =
    s"""{"leaves":${TableFeedSource.vectorJson(leaves)}}"""
}

private[graft] class TableFeedStream(rootPath: String,
    cursors: Option[Map[String, Long]], maxCommitsPerBatch: Option[Long],
    tableSchema: StructType, lease: Option[String] = None,
    leaseTtlMs: Long = 600000L)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  private def root = new Path(rootPath)
  // captured at construction: planning threads must not depend on a
  // thread-local active session surviving query shutdown
  private val hadoopConf =
    SparkSession.active.sparkContext.hadoopConfiguration
  private def fs = root.getFileSystem(hadoopConf)
  // the trailing partition columns are planning state, not file content:
  // the per-file readers decode against data + the two change columns
  private val partSchema = StructType(tableSchema.fields.takeRight(
    tableSchema.fields.length - tableSchema.fieldNames
      .indexOf(FeedSource.VersionCol) - 1))
  private val innerSchema =
    StructType(tableSchema.fields.dropRight(partSchema.length))

  private def leafDir(rel: String): Path =
    if (rel == ".") root else new Path(root, rel)

  /** The LIVE per-leaf head vector: one listing walk + one manifest GET
    * per leaf — O(leaves) driver-side metadata reads, no Spark job.
    * A leaf with a commit log reports its head. A LOG-LESS leaf (a
    * plain listing-mode directory) is adopted only once a committer
    * marker proves it complete: a continuously-polling planner that
    * adopted a half-written directory would commit a partial (possibly
    * empty) birth manifest and silently drop the leaf's initial rows
    * from the feed — the one unacceptable outcome. Two markers count:
    * a `_SUCCESS` INSIDE the leaf (a direct single-directory write),
    * or the TABLE-ROOT `_SUCCESS` at least as new as the leaf dir —
    * Spark's FileOutputCommitter writes `_SUCCESS` only at the job
    * output root for `partitionBy` dynamic-partition appends, so a
    * leaf born mid-stream via `df.write.partitionBy(...)` carries no
    * leaf-local marker ever; the root marker lands AFTER every leaf's
    * files are moved in, so root-marker-mtime >= leaf-dir-mtime proves
    * the leaf complete (a later in-flight job touching the leaf bumps
    * its mtime past the old marker and the leaf waits for the new
    * one). The root-marker path is TRUSTED only where directory
    * mtimes mean something: object stores have no real directories
    * (their "mtime" is 0, epoch, or absent — any stale root marker
    * would adopt a half-written leaf, the exact outcome this guard
    * exists to prevent), so on s3/gs/abfs-class schemes — or whenever
    * the reported leaf mtime is non-positive — a log-less leaf waits
    * for a LEAF-LOCAL `_SUCCESS`. Until a marker lands the leaf is
    * invisible — next round's enumeration adopts it, never a restart.
    * Manifest-native writers (replicate, stageAndPublish,
    * applyChangesDV) are born at their first commit and never wait. */
  private def liveVector(): Map[String, Long] = {
    val rootSuccess: Option[Long] = {
      val p = new Path(root, "_SUCCESS")
      if (fs.exists(p)) Some(fs.getFileStatus(p).getModificationTime)
      else None
    }
    val dirMtimeTrustworthy = !TableFeedSource.NoDirMtimeSchemes
      .contains(Option(root.toUri.getScheme)
        .getOrElse(fs.getUri.getScheme))
    TableFeedSource.leafRels(fs, root).flatMap { rel =>
      val dir = leafDir(rel)
      def jobComplete: Boolean =
        fs.exists(new Path(dir, "_SUCCESS")) || {
          val m = fs.getFileStatus(dir).getModificationTime
          dirMtimeTrustworthy && m > 0L && rootSuccess.exists(_ >= m)
        }
      val snap = ManifestCommit.currentSnapshot(fs, dir).orElse {
        if (jobComplete) Some(ManifestCommit.bootstrap(fs, dir))
        else None
      }
      snap.map(rel -> _.version)
    }.toMap
  }

  /** Pinned head vector for Trigger.AvailableNow: commits AND leaves
    * born after query start are left for the next run. */
  @volatile private var availableTarget: Option[Map[String, Long]] = None

  override def initialOffset(): Offset = {
    val init = cursors.getOrElse(liveVector())
    if (lease.isDefined) renewLeases(init, liveVector())
    TableFeedOffset(init)
  }

  override def prepareForTriggerAvailableNow(): Unit =
    availableTarget = Some(liveVector())

  /** Per-leaf commit-rate admission control; a leaf with no start entry
    * (born after the bookmark) enters at its head — its snapshot replay
    * is one atomic version. A leaf with a start entry but no live
    * listing (dropped) keeps its entry frozen so offsets stay monotone. */
  /** With `option("lease", id)`: pin EVERY listed leaf's consumed
    * cursor version against that leaf's pruneLog for `leaseTtlMs`,
    * renewed every planning round — so a slow table-level consumer
    * never loses the manifests its next batch needs. Up-to-date leaves
    * renew too (cursor == head): several commits can land on such a
    * leaf between planning rounds, and an aggressive prune
    * (keepLast small) racing that window would drop the start-cursor
    * manifest the NEXT batch's commitsBetween still reads — the gap
    * the per-leaf FeedStream avoids by renewing unconditionally. The
    * PUT is one small rename per leaf per round; a table whose round
    * cadence makes O(leaves) PUTs matter should shard consumers. */
  private def renewLeases(start: Map[String, Long],
      tgt: Map[String, Long]): Unit = lease.foreach { id =>
    tgt.foreach { case (rel, head) =>
      val cursor = start.getOrElse(rel, head) // born leaf pins its head
      ManifestCommit.acquireLease(fs, leafDir(rel), id,
        math.max(cursor, 0L), leaseTtlMs)
    }
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[TableFeedOffset].leaves
    val tgt = availableTarget.getOrElse(liveVector())
    renewLeases(s, tgt)
    val advanced = tgt.map { case (rel, head) =>
      rel -> (s.get(rel) match {
        case Some(v) => maxCommitsPerBatch.fold(head)(n =>
          math.min(head, v + math.max(1L, n)))
        case None => head
      })
    }
    TableFeedOffset(advanced ++ (s -- tgt.keySet))
  }

  override def reportLatestOffset(): Offset =
    TableFeedOffset(availableTarget.getOrElse(liveVector()))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "graft-tablefeed implements SupportsAdmissionControl; " +
        "latestOffset(start, limit) is the planning entry point")

  override def deserializeOffset(json: String): Offset =
    TableFeedOffset(TableFeedSource.parseVector(json))

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TableFeedOffset].leaves
    val e = end.asInstanceOf[TableFeedOffset].leaves
    val spark = SparkSession.active
    e.toSeq.sortBy(_._1).flatMap { case (rel, ev) =>
      val sv = s.getOrElse(rel, FeedSource.BootstrapOffset)
      if (sv == ev) Nil
      else {
        // decode eagerly so a born leaf with a value the inferred type
        // cannot carry fails AT PLANNING, naming the leaf
        TableFeedSource.partitionRow(rel, partSchema)
        // pure-insert replay rides the vectorized tier per leaf
        VecFeed.convert(spark, fs,
          FeedPlanner.planLeafRange(fs, leafDir(rel), sv, ev))
          .map(p => TableFeedPartition(p, rel): InputPartition)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TableFeedReaderFactory(innerSchema, partSchema,
      new org.apache.spark.util.SerializableConfiguration(
        SparkSession.active.sessionState.newHadoopConf()),
      VecFeed.dataFactory(SparkSession.active,
        StructType(innerSchema.fields.dropRight(2))))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One leaf delta partition (a Group-reader [[FeedFilePartition]] or a
  * vectorized [[VecFeed.VecFeedPartition]] split) plus the leaf's
  * root-relative path — the partition VALUES travel as the path string
  * (tiny, already a name) and are decoded once per task against the
  * inferred types. */
private[graft] case class TableFeedPartition(leaf: InputPartition,
    rel: String) extends InputPartition

private[sources] class TableFeedReaderFactory(innerSchema: StructType,
    partSchema: StructType,
    conf: org.apache.spark.util.SerializableConfiguration,
    vec: PartitionReaderFactory) extends PartitionReaderFactory {
  private lazy val split =
    new FeedSplitReaderFactory(innerSchema, conf, vec)
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TableFeedPartition]
    val inner = split.createReader(p.leaf)
    // one constant row per task; JoinedRow appends it with zero copying
    val partRow = TableFeedSource.partitionRow(p.rel, partSchema)
    new PartitionReader[InternalRow] {
      private val joined = new JoinedRow()
      override def next(): Boolean = inner.next()
      override def get(): InternalRow = joined(inner.get(), partRow)
      override def close(): Unit = inner.close()
    }
  }
}
