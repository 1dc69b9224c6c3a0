package graft.lake

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.connector.write.{DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, V1Write, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.{And, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, InsertableRelation, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.{FeedFilePartition, FeedReaderFactory, FeedSource}

/** SQL-native surface of the manifest lake — a DataSourceV2
  * [[TableCatalog]], so plain `spark.sql` flows through the manifest
  * commit protocol with no library calls:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft", "graft.lake.GraftCatalog")
  * spark.conf.set("spark.sql.catalog.graft.warehouse", "/lake")
  * spark.sql("CREATE TABLE graft.db.t (k BIGINT, v DOUBLE)")
  * spark.sql("INSERT INTO graft.db.t SELECT ...")
  * spark.sql("SELECT * FROM graft.db.t")
  * }}}
  *
  *  - **CREATE TABLE** bootstraps the commit log and records the
  *    declared schema as the table's manifest schema
  *    ([[ManifestCommit.alterSchema]]) — table open afterwards is one
  *    manifest GET, zero footer reads.
  *  - **INSERT INTO** lands through [[ManifestCommit.stageAndPublish]]:
  *    files staged invisibly, then ONE atomic manifest commit — a
  *    failed insert leaves only sweepable hidden garbage, and
  *    concurrent inserts serialize through the optimistic commit
  *    protocol like any library writer. (Append-only v1: INSERT
  *    OVERWRITE is refused — rewrites stay library verbs.)
  *  - **SELECT** plans one InputPartition per live data file straight
  *    from the manifest (no directory listing), column pruning pushed
  *    into the per-file reader (fields resolve by name), long-range
  *    predicates pruning FILES against the manifest's per-file stats.
  *    Reads are MERGE-ON-READ: active deletion-vector sidecars
  *    subtract positionally inside each touched file's reader, so a
  *    post-DELETE table reads correctly with no compaction step.
  *  - **DELETE FROM ... WHERE** (one conjunctive long range on one
  *    column) lands as a positional deletion-vector sidecar in ONE
  *    commit ([[ManifestCommit.deleteWhereDV]]) — O(deleted rows)
  *    write amplification, no file rewrites; looser predicates refuse
  *    loudly rather than under-delete.
  *  - **ALTER TABLE ... ADD COLUMN** maps to the additive
  *    [[ManifestCommit.alterSchema]]; drops/retypes refuse (readers
  *    mergeSchema committed files — the recorded schema must not lie).
  *  - **Time travel**: `SELECT ... FROM t VERSION AS OF n` reads the
  *    snapshot at manifest version `n` with that version's sidecars
  *    subtracting and the schema as recorded THEN (a later-added
  *    column does not surface). Read-only; valid until `pruneLog`
  *    drops the manifest — the log retention IS the time-travel
  *    horizon, and a pruned version refuses loudly.
  *
  * Layout: `warehouse/<namespace dirs...>/<table>` — each table is one
  * manifest partition (the unpartitioned lake shape; Hive-partitioned
  * tables keep the library surface). Tables created by library calls
  * under the warehouse are visible to SQL and vice versa: the manifest
  * is the single source of truth. */
class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catName: String = _
  private var warehouse: Path = _
  private def spark = SparkSession.active
  private def fs: FileSystem =
    warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catName = name
    val w = options.get("warehouse")
    require(w != null,
      s"graft catalog '$name' needs spark.sql.catalog.$name.warehouse")
    warehouse = new Path(w)
  }
  override def name(): String = catName

  private def tableDir(ident: Identifier): Path =
    (ident.namespace() :+ ident.name())
      .foldLeft(warehouse)((p, seg) => new Path(p, seg))
  private def nsDir(ns: Array[String]): Path =
    ns.foldLeft(warehouse)((p, seg) => new Path(p, seg))
  private def isTableDir(p: Path): Boolean =
    fs.exists(new Path(p, ManifestCommit.LogDirName))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsDir(namespace)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(
      catName +: namespace.toSeq)
    fs.listStatus(dir).toSeq
      .filter(st => st.isDirectory && isTableDir(st.getPath))
      .map(st => Identifier.of(namespace, st.getPath.getName))
      .toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    if (!isTableDir(dir)) throw new NoSuchTableException(
      (catName +: ident.namespace() :+ ident.name()).toSeq)
    val schema = ManifestCommit.currentSchema(fs, dir).getOrElse(
      sys.error(s"graft catalog: table $ident at $dir has no recorded " +
        "manifest schema — record one (ManifestCommit.recordSchema) " +
        "before reading it through SQL"))
    new GraftSqlTable(dir.toString, ident.toString, schema)
  }

  /** Time travel — `SELECT ... FROM t VERSION AS OF n`: the table at
    * manifest version `n` (files from that snapshot, that version's
    * active sidecars subtracting, the schema AS RECORDED THEN — a
    * later-added column did not exist at `n` and must not surface).
    * Valid until [[ManifestCommit.pruneLog]] drops the manifest; a
    * pruned version refuses loudly. Read-only: writes/deletes against
    * a pinned version refuse. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = tableDir(ident)
    if (!isTableDir(dir)) throw new NoSuchTableException(
      (catName +: ident.namespace() :+ ident.name()).toSeq)
    val v = try version.toLong catch {
      case _: NumberFormatException => sys.error(
        s"graft catalog: VERSION AS OF wants a commit version " +
          s"(a number); got '$version'")
    }
    require(ManifestCommit.snapshotAt(fs, dir, v).isDefined,
      s"graft catalog: version $v of $ident is gone — the log was " +
        "pruned past it (pruneLog retention is the time-travel horizon)")
    val schema = ManifestCommit.schemaAt(fs, dir, v)
      .orElse(ManifestCommit.currentSchema(fs, dir)).getOrElse(
        sys.error(s"graft catalog: table $ident has no recorded schema"))
    new GraftSqlTable(dir.toString, s"$ident@v$v", schema, asOf = Some(v))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft catalog: PARTITIONED BY is not supported through SQL — " +
        "each SQL table is one manifest partition; Hive-partitioned " +
        "lakes keep the library surface")
    val dir = tableDir(ident)
    if (isTableDir(dir)) throw new TableAlreadyExistsException(
      (catName +: ident.namespace() :+ ident.name()).toSeq)
    fs.mkdirs(dir)
    ManifestCommit.bootstrap(fs, dir)
    ManifestCommit.alterSchema(fs, dir, schema)
    new GraftSqlTable(dir.toString, ident.toString, schema)
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val dir = tableDir(ident)
    val prev = loadTable(ident).asInstanceOf[GraftSqlTable]
    val added = changes.map {
      case a: TableChange.AddColumn =>
        require(a.fieldNames().length == 1,
          "graft catalog: nested ADD COLUMN is not supported")
        org.apache.spark.sql.types
          .StructField(a.fieldNames()(0), a.dataType(), nullable = true)
      case other => sys.error("graft catalog: only additive ADD COLUMN " +
        s"is supported through SQL (got ${other.getClass.getSimpleName})" +
        " — drops/retypes would make the recorded schema lie about " +
        "committed files")
    }
    val next = StructType(prev.schema().fields ++ added)
    ManifestCommit.alterSchema(fs, dir, next)
    new GraftSqlTable(dir.toString, ident.toString, next)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    isTableDir(dir) && fs.delete(dir, true)
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    if (!isTableDir(tableDir(oldIdent))) throw new NoSuchTableException(
      (catName +: oldIdent.namespace() :+ oldIdent.name()).toSeq)
    require(fs.rename(tableDir(oldIdent), tableDir(newIdent)),
      s"graft catalog: rename $oldIdent -> $newIdent failed")
  }

  // --- namespaces: directories under the warehouse ---
  override def listNamespaces(): Array[Array[String]] =
    if (!fs.exists(warehouse)) Array.empty
    else fs.listStatus(warehouse).toSeq
      .filter(st => st.isDirectory && !isTableDir(st.getPath) &&
        !st.getPath.getName.startsWith(".") &&
        !st.getPath.getName.startsWith("_"))
      .map(st => Array(st.getPath.getName)).toArray
  override def listNamespaces(ns: Array[String]): Array[Array[String]] = {
    if (ns.isEmpty) return listNamespaces()
    if (!fs.exists(nsDir(ns)))
      throw new NoSuchNamespaceException(catName +: ns.toSeq)
    Array.empty
  }
  override def loadNamespaceMetadata(
      ns: Array[String]): util.Map[String, String] = {
    if (ns.nonEmpty && !fs.exists(nsDir(ns)))
      throw new NoSuchNamespaceException(catName +: ns.toSeq)
    util.Collections.emptyMap()
  }
  override def createNamespace(ns: Array[String],
      metadata: util.Map[String, String]): Unit = {
    fs.mkdirs(nsDir(ns))
    ()
  }
  override def alterNamespace(ns: Array[String],
      changes: NamespaceChange*): Unit =
    sys.error("graft catalog: namespaces carry no mutable metadata")
  override def dropNamespace(ns: Array[String],
      cascade: Boolean): Boolean = {
    val dir = nsDir(ns)
    if (!fs.exists(dir)) return false
    require(cascade || fs.listStatus(dir).isEmpty,
      s"graft catalog: namespace ${ns.mkString(".")} is not empty")
    fs.delete(dir, true)
  }
}

private[graft] object GraftSqlTable {
  private def longOf(v: Any): Option[Long] = v match {
    case l: Long  => Some(l)
    case i: Int   => Some(i.toLong)
    case s: Short => Some(s.toLong)
    case b: Byte  => Some(b.toLong)
    case _        => None
  }

  /** One v1 filter as a closed long range on one column, None when the
    * shape is not a long comparison. */
  private def rangeOf(f: Filter): Option[(String, Long, Long)] = f match {
    case EqualTo(c, v)            => longOf(v).map(l => (c, l, l))
    case GreaterThanOrEqual(c, v) => longOf(v).map(l => (c, l, Long.MaxValue))
    case GreaterThan(c, v)        =>
      longOf(v).collect { case l if l < Long.MaxValue => (c, l + 1, Long.MaxValue) }
    case LessThanOrEqual(c, v)    => longOf(v).map(l => (c, Long.MinValue, l))
    case LessThan(c, v)           =>
      longOf(v).collect { case l if l > Long.MinValue => (c, Long.MinValue, l - 1) }
    case And(l, r)                =>
      (rangeOf(l), rangeOf(r)) match {
        case (Some((c1, lo1, hi1)), Some((c2, lo2, hi2))) if c1 == c2 =>
          Some((c1, math.max(lo1, lo2), math.min(hi1, hi2)))
        case _ => None
      }
    case _ => None
  }

  /** Conjunctive per-column long bounds across a filter set, for
    * stats-based FILE PRUNING: unsupported filters contribute nothing
    * (they are re-evaluated post-scan either way — pruning is an
    * optimization, never a correctness lever). */
  private[graft] def pruningRanges(
      filters: Seq[Filter]): Map[String, (Long, Long)] =
    filters.flatMap(rangeOf)
      .groupBy(_._1)
      .map { case (c, rs) =>
        c -> (rs.map(_._2).max, rs.map(_._3).min)
      }

  /** The ONE closed range the whole filter set expresses, for
    * `DELETE FROM ... WHERE`: defined only when EVERY filter is a long
    * comparison on the SAME column — anything looser must refuse, not
    * under-delete. */
  private[graft] def deleteRange(
      filters: Seq[Filter]): Option[(String, Long, Long)] = {
    if (filters.isEmpty) return None
    val rs = filters.map(rangeOf)
    if (rs.exists(_.isEmpty)) return None
    val cols = rs.flatten.map(_._1).distinct
    if (cols.size != 1) return None
    Some((cols.head,
      rs.flatten.map(_._2).max, rs.flatten.map(_._3).min))
  }
}

/** One manifest-lake table as a DSv2 Table: manifest-planned
  * merge-on-read batch reads, stage-and-publish batch appends, and
  * range deletes landing as positional deletion-vector sidecars. */
private[graft] class GraftSqlTable(path: String, ident: String,
    tableSchema: StructType, asOf: Option[Long] = None) extends Table
    with SupportsRead with SupportsWrite with SupportsDelete {
  override def name(): String = ident
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    if (asOf.isDefined) util.EnumSet.of(TableCapability.BATCH_READ)
    else util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftSqlScan(path, tableSchema, asOf)

  /** `DELETE FROM t WHERE <long range on one column>` — lands as ONE
    * merge-on-read commit ([[ManifestCommit.deleteWhereDV]]): a
    * positional deletion-vector sidecar names the doomed rows, the
    * live file set never moves, write amplification is O(deleted
    * rows). Anything the range shape can't express refuses loudly
    * (canDeleteWhere) rather than under-deleting. NULL keys match no
    * range — exactly SQL's three-valued WHERE. */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    asOf.isEmpty && GraftSqlTable.deleteRange(filters.toSeq).isDefined
  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(asOf.isEmpty,
      s"graft catalog: $ident is a pinned time-travel read — history " +
        "is immutable, delete against the live table")
    val (c, lo, hi) = GraftSqlTable.deleteRange(filters.toSeq).getOrElse(
      sys.error(s"graft catalog: DELETE on $ident supports one " +
        "conjunctive long range on a single column (k = v, k >= lo AND " +
        s"k <= hi, ...); got ${filters.mkString(", ")} — rewrite-shaped " +
        "deletes stay library verbs (deleteRange/applyChangesDV)"))
    ManifestCommit.deleteWhereDV(SparkSession.active,
      new Path(path), c, lo, hi)
    ()
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame,
                overwrite: Boolean): Unit = {
              require(!overwrite,
                s"graft catalog: INSERT OVERWRITE on $ident is not " +
                  "supported — SQL writes are append-only (one atomic " +
                  "stage-and-publish commit); rewrites stay library " +
                  "verbs (deleteRange/compact/applyChangesDV)")
              ManifestCommit.stageAndPublish(data.sparkSession,
                  new Path(path), data, _ => true)
                .getOrElse(sys.error(
                  s"graft catalog: insert into $ident did not publish"))
              ()
            }
          }
        // `writeStream.toTable(...)`: epochs land as atomic manifest
        // commits carrying the query id as a txn watermark — a
        // replayed epoch (post-crash re-delivery against the same
        // checkpoint) no-ops, the manifest is the only ledger
        override def toStreaming: StreamingWrite =
          new GraftStreamingWrite(path, ident, info.schema(),
            info.queryId())
      }
    }
}

/** Batch scan: live files straight from the manifest (zero listing,
  * zero jobs at planning), one partition per file, pruned columns
  * resolved by name in the per-file reader. Long-range predicates
  * prune FILES against the manifest's recorded per-file stats (the
  * readTableWhere logic behind plain SQL); active deletion-vector
  * sidecars subtract positionally inside each touched file's reader
  * (dvKeep=false — the merge-on-read composition the bootstrap feed
  * uses), so SQL reads never resurrect deleted rows and never require
  * a compaction first. */
private[graft] class GraftSqlScan(path: String, full: StructType,
    asOf: Option[Long] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with Scan with Batch {
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve OUR field order/types; Spark's required set drives which
    // columns the readers materialize
    required = StructType(
      full.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))
  /** Every filter stays a residual (Spark re-evaluates post-scan —
    * stats pruning is a file-skipping optimization, never the row
    * filter); the range-shaped subset is recorded for pruning and
    * surfaces in EXPLAIN as the pushed set. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f =>
      GraftSqlTable.pruningRanges(Seq(f)).nonEmpty)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = this
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-sql $path pruned=[${pushed.mkString(", ")}]"
  override def toBatch: Batch = this

  /** `spark.readStream.table(t)` — the table as an APPEND stream: the
    * first micro-batch is the committed snapshot (active DV sidecars
    * subtracted inside the readers), later batches tail the commit log
    * and surface appended rows; offsets are commit versions, so the
    * checkpointed cursor resumes exactly. A row-MUTATING commit
    * (dvdelete/upsert) in the tail refuses loudly — an append-only
    * table stream cannot retract rows; the CHANGE FEED (the FeedSource
    * format, `_change_type` rows) is the consumer for mutable tables. */
  override def toMicroBatchStream(
      checkpointLocation: String): MicroBatchStream =
    new GraftSqlMicroBatchStream(path, required)

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snap = asOf match {
      case Some(v) => ManifestCommit.snapshotAt(fs, dir, v).getOrElse(
        sys.error(s"graft catalog: version $v of $path pruned between " +
          "plan and read — restart the query"))
      case None => ManifestCommit.currentSnapshot(fs, dir).getOrElse(
        sys.error(s"graft catalog: $path has no committed snapshot"))
    }
    // stats-pruned live set: a file provably outside every pushed
    // range never plans a partition (one manifest GET, zero footers).
    // Stats are head-state (per FILE, monotone under append — a
    // time-traveled file's stats never change after its commit).
    val ranges = GraftSqlTable.pruningRanges(pushed.toSeq)
    val stats =
      if (ranges.isEmpty) Map.empty[String, Seq[ManifestCommit.ColStat]]
      else ManifestCommit.currentFileStats(fs, dir)
    // point predicates (lo == hi) additionally consult recorded
    // per-file BLOOMS — readTableEq's pruning, now behind plain SQL: a
    // bloom that rejects the value drops the file even when its
    // min/max range admits it
    val points = ranges.collect { case (c, (lo, hi)) if lo == hi =>
      (c, lo)
    }
    val blooms =
      if (points.isEmpty) Map.empty[String, Seq[ManifestCommit.ColBloom]]
      else ManifestCommit.currentFileBlooms(fs, dir)
    val kept = snap.files.filter { n =>
      ranges.forall { case (c, (lo, hi)) =>
        stats.getOrElse(n, Nil).find(_.col == c)
          .forall(s => s.max >= lo && s.min <= hi)
      } && points.forall { case (c, v) =>
        blooms.getOrElse(n, Nil).find(_.col == c)
          .forall(_.mightContain(v))
      }
    }
    // merge-on-read: files a sidecar names carry the sidecar paths and
    // subtract their positions executor-side; the touched set resolves
    // from sidecar footer stats (driver-side, no job), a superset being
    // safe — an untouched false positive loads an empty position set.
    // A time-travel read subtracts the sidecars ACTIVE AT that version.
    val dvs = asOf.fold(ManifestCommit.currentDvs(fs, dir))(v =>
        ManifestCommit.dvsAt(fs, dir, v))
      .map(n => new Path(dir, n).toString)
    val touched: Set[String] =
      if (dvs.isEmpty) Set.empty
      else {
        val conf = spark.sessionState.newHadoopConf()
        FeedSource.sidecarNameRanges(conf, dvs) match {
          case Some(rs) =>
            kept.filter(n => rs.exists(r => n >= r._1 && n <= r._2)).toSet
          case None => FeedSource.sidecarFileNamesDriverSide(conf, dvs)
        }
      }
    kept.map(n => FeedFilePartition(new Path(dir, n).toString,
      "insert", snap.version, None,
      dvSidecars = if (touched.contains(n)) dvs else Nil,
      dvKeep = false): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FeedReaderFactory(required,
      new org.apache.spark.util.SerializableConfiguration(
        SparkSession.active.sessionState.newHadoopConf()),
      feedCols = false)
}

/** The append-only streaming read of one SQL table: planning delegates
  * to the bootstrap-mode [[graft.sources.FeedStream]] (snapshot first,
  * then the commit-log tail — offsets ARE commit versions), readers
  * decode pure data columns, and any partition that would RETRACT a
  * row (a dvdelete/upsert replay) fails the batch loudly. */
private[graft] class GraftSqlMicroBatchStream(path: String,
    required: StructType) extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}
  private val inner = new graft.sources.FeedStream(path, None, None,
    graft.sources.FeedSource.fullSchema(path), bootstrap = true)

  override def initialOffset(): Offset = inner.initialOffset()
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    inner.latestOffset(start, limit)
  override def reportLatestOffset(): Offset = inner.reportLatestOffset()
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "graft-sql stream implements SupportsAdmissionControl")
  override def prepareForTriggerAvailableNow(): Unit =
    inner.prepareForTriggerAvailableNow()
  override def deserializeOffset(json: String): Offset =
    inner.deserializeOffset(json)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val parts = inner.planInputPartitions(start, end)
    parts.foreach { ip =>
      val p = ip.asInstanceOf[FeedFilePartition]
      require(p.changeType == "insert" &&
        (p.dvSidecars.isEmpty || !p.dvKeep),
        s"graft catalog: readStream.table($path) saw a row-mutating " +
          s"commit (a ${p.changeType} replay at v${p.version}) — an " +
          "append-only table stream cannot retract rows; consume the " +
          "change feed (format graft.sources.FeedSource) instead")
    }
    parts
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FeedReaderFactory(required,
      new org.apache.spark.util.SerializableConfiguration(
        SparkSession.active.sessionState.newHadoopConf()),
      feedCols = false)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One staged parquet file a streaming-epoch task produced: the hidden
  * staging dir (swept if the epoch crashes), the file inside it, and
  * the row count (empty tasks stage nothing to commit). */
private[graft] case class GraftStagedFile(stagingDir: String,
    file: String, rows: Long) extends WriterCommitMessage

/** The streaming half of the SQL surface — `writeStream.toTable(t)`:
  * each task writes its rows as ONE parquet file into a hidden
  * `._compacting-stream-*` staging dir (the same swept prefix every
  * other crashed-stage residue uses); the driver's epoch commit renames
  * the files visible and appends them in ONE manifest commit carrying
  * `(queryId, epochId)` as the transaction watermark — so a replayed
  * epoch (crash between sink commit and checkpoint write) is a NO-OP
  * and the landed table is exactly-once with no sink metadata log.
  * Work per epoch ∝ the epoch's rows; concurrent library/SQL writers
  * serialize through the optimistic commit protocol as usual. */
private[graft] class GraftStreamingWrite(path: String, ident: String,
    schema: StructType, queryId: String) extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftStreamWriterFactory(path, schema,
      new org.apache.spark.util.SerializableConfiguration(
        SparkSession.active.sessionState.newHadoopConf()))

  private def fsOf = new Path(path).getFileSystem(
    SparkSession.active.sparkContext.hadoopConfiguration)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val fs = fsOf
    val dir = new Path(path)
    val staged = messages.collect {
      case m: GraftStagedFile if m.rows > 0 => m
    }
    def dropStaging(): Unit = messages.collect {
      case m: GraftStagedFile =>
        fs.delete(new Path(m.stagingDir), true)
    }
    // the txn watermark check appendFiles would do, surfaced early so
    // a replayed epoch never moves files at all
    if (ManifestCommit.lastTxnVersion(fs, dir, queryId)
        .exists(_ >= epochId)) {
      dropStaging()
      return
    }
    if (staged.isEmpty) {
      // an empty epoch still advances the watermark — a replay of it
      // must stay a no-op even if a later non-empty epoch crashed
      ManifestCommit.appendFiles(fs, dir, Nil,
        txn = Some((queryId, epochId)))
      dropStaging()
      return
    }
    val qid = queryId.replaceAll("[^A-Za-z0-9]", "").take(8)
    val names = staged.zipWithIndex.map { case (m, i) =>
      val name =
        s"${ManifestCommit.CompactedPrefix}stream-$qid-e$epochId-$i.parquet"
      require(fs.rename(new Path(m.stagingDir, m.file),
        new Path(dir, name)),
        s"graft catalog: cannot move staged ${m.file} into $path")
      name
    }
    ManifestCommit.appendFiles(fs, dir, names.toSeq,
      txn = Some((queryId, epochId)))
    dropStaging()
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val fs = fsOf
    messages.foreach {
      case m: GraftStagedFile => fs.delete(new Path(m.stagingDir), true)
      case _ =>
    }
  }
}

private[graft] class GraftStreamWriterFactory(path: String,
    schema: StructType,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends StreamingDataWriterFactory with DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftParquetDataWriter(path, schema, conf.value,
      s"e$epochId-p$partitionId-t$taskId")
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new GraftParquetDataWriter(path, schema, conf.value,
      s"b-p$partitionId-t$taskId")
}

/** Executor-side parquet writer over the Group API — the write twin of
  * [[graft.sources.FeedReaderFactory]]'s reader (same scalar surface:
  * the types SQL DDL can declare on this catalog). Lazy: an empty task
  * never creates a file. */
private[graft] class GraftParquetDataWriter(path: String,
    schema: StructType, conf: org.apache.hadoop.conf.Configuration,
    tag: String) extends DataWriter[InternalRow] {
  import org.apache.parquet.example.data.simple.SimpleGroupFactory
  import org.apache.parquet.hadoop.example.ExampleParquetWriter
  import org.apache.parquet.io.api.Binary
  import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
  import org.apache.spark.sql.types._

  private val messageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val prim = f.dataType match {
        case LongType    => Types.optional(INT64)
        case IntegerType => Types.optional(INT32)
        case DoubleType  => Types.optional(DOUBLE)
        case FloatType   => Types.optional(FLOAT)
        case BooleanType => Types.optional(BOOLEAN)
        case StringType  =>
          Types.optional(BINARY).as(LogicalTypeAnnotation.stringType())
        case o => sys.error("graft catalog: streaming writes support " +
          s"the scalar SQL surface; column ${f.name} is $o")
      }
      b.addField(prim.named(f.name))
    }
    b.named("spark_schema")
  }
  private val groups = new SimpleGroupFactory(messageType)
  private val stagingDir = new Path(path,
    s"._compacting-stream-$tag-${java.util.UUID.randomUUID.toString.take(8)}")
  private val fileName = "part.parquet"
  private var rows = 0L
  private lazy val writer = ExampleParquetWriter
    .builder(new Path(stagingDir, fileName))
    .withConf(conf).withType(messageType).build()

  override def write(row: InternalRow): Unit = {
    val g = groups.newGroup()
    var i = 0
    while (i < schema.fields.length) {
      val f = schema.fields(i)
      if (!row.isNullAt(i)) f.dataType match {
        case LongType    => g.add(f.name, row.getLong(i))
        case IntegerType => g.add(f.name, row.getInt(i))
        case DoubleType  => g.add(f.name, row.getDouble(i))
        case FloatType   => g.add(f.name, row.getFloat(i))
        case BooleanType => g.add(f.name, row.getBoolean(i))
        case StringType  =>
          g.add(f.name, Binary.fromString(row.getUTF8String(i).toString))
        case _ => () // unreachable: messageType construction refused
      }
      i += 1
    }
    writer.write(g)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    if (rows > 0) writer.close()
    GraftStagedFile(stagingDir.toString, fileName, rows)
  }
  override def abort(): Unit = {
    if (rows > 0) writer.close()
    stagingDir.getFileSystem(conf).delete(stagingDir, true)
    ()
  }
  override def close(): Unit = ()
}
