package graft.lake

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Catalyst [[FileIndex]] over the manifest commit log — the integration
  * that makes the lake a FIRST-CLASS Spark table (the public Delta
  * `TahoeFileIndex` idea, re-derived): `ManifestCommit.table(spark,
  * root).filter($"k" === v)` plans through Spark's own planner, which
  * hands the pushed-down partition and data predicates to
  * [[listFiles]], and THIS index answers them from committed manifest
  * metadata — per-file min/max stats for ranges, per-file blooms for
  * point probes, Hive-style `year=/month=/day=` directory values for
  * partition pruning. No explicit `ranges` map, no footer sweep: the
  * SQL WHERE clause alone selects the file set, and everything
  * downstream (vectorized parquet read, row-group pruning, codegen) is
  * stock Spark.
  *
  * Scale shape: resolution is one manifest GET + one LIST per leaf
  * partition (the metadata cost every reader already pays);
  * [[listFiles]] evaluates predicates against in-memory stat lines —
  * at 100 TB the planner touches KBs of manifest state, never the
  * table. Pruning is a superset guarantee exactly as in
  * [[ManifestCommit.readTableWhere]]: unknown predicate shapes and
  * stats-free files are conservatively kept, and Spark re-applies the
  * full row-level filter after the scan.
  *
  * Deletion vectors: a partition with ACTIVE sidecars cannot be served
  * by a bare file scan (rows would resurrect) — [[ManifestCommit.table]]
  * refuses loudly and points at readTableDV/applyDvs.
  */
final class GraftFileIndex(spark: SparkSession, root: Path)
    extends FileIndex {
  import ManifestCommit.{ColBloom, ColStat}

  private val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private case class Leaf(dir: Path, values: InternalRow,
      files: Seq[FileStatus], stats: Map[String, Seq[ColStat]],
      blooms: Map[String, Seq[ColBloom]], dvs: Seq[String],
      schema: Option[StructType])

  private def resolve(): Seq[Leaf] = {
    val parts = Compaction.leafPartitions(fs, root) match {
      case Seq() => Seq(root)
      case ps    => ps
    }
    parts.map { dir =>
      // ONE log LIST + ONE manifest parse per leaf serves every facet
      // (files, stats, blooms, DVs, schema) — resolving them through
      // the per-facet accessors would pay five metadata GETs per leaf,
      // the dominant table-open cost at thousands of leaves
      val head = ManifestCommit.headState(fs, dir)
      val names = head match {
        case Some(h) => h.files
        case None => // listing-mode partition interop, as in liveFiles
          if (fs.exists(dir))
            fs.listStatus(dir).toIndexedSeq
              .filter(st => !st.isDirectory &&
                !st.getPath.getName.startsWith("_") &&
                !st.getPath.getName.startsWith("."))
              .map(_.getPath.getName)
          else Nil
      }
      val byName = if (fs.exists(dir))
        fs.listStatus(dir).toIndexedSeq.filterNot(_.isDirectory)
          .map(st => st.getPath.getName -> st).toMap
      else Map.empty[String, FileStatus]
      val files = names.map(n => byName.getOrElse(n, sys.error(
        s"manifest for $dir lists missing file $n — GC grace too short?")))
      Leaf(dir, partitionValues(dir), files,
        head.map(_.stats).getOrElse(Map.empty),
        head.map(_.blooms).getOrElse(Map.empty),
        head.map(_.dvs).getOrElse(Nil),
        head.flatMap(_.schema))
    }
  }

  @volatile private var leaves: Seq[Leaf] = resolve()

  /** Active deletion-vector sidecars anywhere under the root. */
  def activeDvs: Seq[String] = leaves.flatMap(_.dvs)

  /** The table's data schema from the RECORDED manifest schemas, when
    * every leaf carries one: an additive field union across leaves
    * (older leaves may predate an evolution), refusing a type clash.
    * None when NO leaf has a record (a legacy table — the caller falls
    * back to a bounded footer inference). A PARTIALLY-recorded table
    * (some leaves recorded, some not) refuses LOUDLY instead: it means
    * an evolution forgot leaves — silently falling back would
    * reintroduce the per-open footer sweep the record exists to kill,
    * and at 100 TB nobody would notice until the open-latency
    * regression. Repair verb: [[ManifestCommit.recordSchemaTable]] /
    * [[ManifestCommit.alterSchemaTable]]. Driver-side manifest metadata
    * only: with this present, opening the table costs ZERO footer
    * reads. */
  private[lake] def recordedSchema: Option[StructType] = {
    val per = leaves.map(_.schema)
    if (per.isEmpty || per.forall(_.isEmpty)) None
    else {
      val missing = leaves.collect { case l if l.schema.isEmpty => l.dir }
      require(missing.isEmpty,
        s"partially-recorded table under $root: ${missing.size} " +
          s"leaf/leaves lack a recorded schema (e.g. ${missing.take(3)
            .mkString(", ")}) while others carry one — run " +
          "ManifestCommit.recordSchemaTable (or alterSchemaTable) to " +
          "repair; a silent footer fallback would reintroduce the " +
          "O(files) sweep per table open")
      Some(per.flatten.reduce { (a, b) =>
      b.foreach { f =>
        val prev = a.find(_.name == f.name)
        require(prev.forall(_.dataType == f.dataType),
          s"leaf schemas disagree on ${f.name}: " +
            s"${prev.get.dataType} vs ${f.dataType} under $root")
      }
      StructType(a.fields ++
        b.filterNot(f => a.fieldNames.contains(f.name)))
      })
    }
  }

  /** Per DV-carrying leaf: (dir, its Hive `col=value` segments, sidecar
    * names) — what [[GraftFileIndex.tableDV]] needs to key the sidecar
    * rows onto the scan's partition columns. */
  private[lake] def dvLeaves: Seq[(Path, Seq[(String, Int)], Seq[String])] =
    leaves.collect { case l if l.dvs.nonEmpty =>
      (l.dir, segmentsOf(l.dir), l.dvs)
    }

  /** Hive-style `col=value` segments between the root and a leaf. Both
    * sides fs-qualified first: leafPartitions returns qualified paths
    * while callers may pass a bare local root — an unstripped prefix
    * would surface scheme segments here and MatchError on "file:". */
  private def segmentsOf(dir: Path): Seq[(String, Int)] = {
    val rel = fs.makeQualified(dir).toString
      .stripPrefix(fs.makeQualified(root).toString)
      .split("/").filter(_.nonEmpty).toSeq
    rel.map { seg =>
      val Array(c, v) = seg.split("=", 2)
      (c, v.toInt)
    }
  }

  // lazy: resolve() runs in the constructor before later vals initialize
  override lazy val partitionSchema: StructType =
    Compaction.leafPartitions(fs, root) match {
      case Seq() => StructType(Nil)
      case ps => StructType(segmentsOf(ps.head)
        .map { case (c, _) => StructField(c, IntegerType, nullable = false) })
    }

  private def partitionValues(dir: Path): InternalRow =
    if (partitionSchema.isEmpty) InternalRow.empty
    else InternalRow.fromSeq(segmentsOf(dir).map(_._2))

  override def rootPaths: Seq[Path] = Seq(root)

  override def refresh(): Unit = { leaves = resolve() }

  override def inputFiles: Array[String] =
    leaves.flatMap(_.files.map(_.getPath.toString)).toArray

  override def sizeInBytes: Long = leaves.flatMap(_.files.map(_.getLen)).sum

  /** Conjuncts of the pushed predicates. */
  private def conjuncts(es: Seq[Expression]): Seq[Expression] =
    es.flatMap {
      case And(l, r) => conjuncts(Seq(l)) ++ conjuncts(Seq(r))
      case e         => Seq(e)
    }

  private def litLong(l: Literal): Option[Long] = l.dataType match {
    case LongType    => Option(l.value).map(_.asInstanceOf[Long])
    case IntegerType => Option(l.value).map(_.asInstanceOf[Int].toLong)
    case _           => None
  }

  /** Per-column [lo, hi] requirement and equality-probe set implied by
    * the recognized conjuncts; everything else is ignored
    * (conservative — kept files are a superset). */
  private def requirements(filters: Seq[Expression])
      : (Map[String, (Long, Long)], Map[String, Seq[Long]]) = {
    var ranges = Map.empty[String, (Long, Long)]
    var probes = Map.empty[String, Seq[Long]]
    def tighten(c: String, lo: Long, hi: Long): Unit = {
      val (plo, phi) = ranges.getOrElse(c, (Long.MinValue, Long.MaxValue))
      ranges += c -> (math.max(plo, lo), math.min(phi, hi))
    }
    conjuncts(filters).foreach {
      case EqualTo(a: AttributeReference, l: Literal) =>
        litLong(l).foreach { v =>
          tighten(a.name, v, v)
          probes += a.name -> (probes.getOrElse(a.name, Nil) :+ v)
        }
      case EqualTo(l: Literal, a: AttributeReference) =>
        litLong(l).foreach { v =>
          tighten(a.name, v, v)
          probes += a.name -> (probes.getOrElse(a.name, Nil) :+ v)
        }
      case GreaterThan(a: AttributeReference, l: Literal) =>
        litLong(l).foreach(v => tighten(a.name, v + 1, Long.MaxValue))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        litLong(l).foreach(v => tighten(a.name, v, Long.MaxValue))
      case LessThan(a: AttributeReference, l: Literal) =>
        litLong(l).foreach(v => tighten(a.name, Long.MinValue, v - 1))
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        litLong(l).foreach(v => tighten(a.name, Long.MinValue, v))
      case GreaterThan(l: Literal, a: AttributeReference) => // v > a
        litLong(l).foreach(v => tighten(a.name, Long.MinValue, v - 1))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        litLong(l).foreach(v => tighten(a.name, Long.MinValue, v))
      case LessThan(l: Literal, a: AttributeReference) => // v < a
        litLong(l).foreach(v => tighten(a.name, v + 1, Long.MaxValue))
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        litLong(l).foreach(v => tighten(a.name, v, Long.MaxValue))
      case In(a: AttributeReference, vs) if vs.forall {
            case l: Literal => litLong(l).isDefined
            case _          => false
          } =>
        val values = vs.collect { case l: Literal => litLong(l).get }
        if (values.nonEmpty) {
          tighten(a.name, values.min, values.max)
          probes += a.name -> (probes.getOrElse(a.name, Nil) ++ values)
        }
      case _ => // unrecognized: no pruning contribution
    }
    (ranges, probes)
  }

  private def survives(name: String, leaf: Leaf,
      ranges: Map[String, (Long, Long)],
      probes: Map[String, Seq[Long]]): Boolean = {
    val stats = leaf.stats.getOrElse(name, Nil)
    val statOk = ranges.forall { case (c, (lo, hi)) =>
      stats.find(_.col == c).forall(s => s.max >= lo && s.min <= hi)
    }
    // bloom rejection: EVERY probed value absent -> the equality (or the
    // whole IN list) cannot match in this file
    val bloomOk = probes.forall { case (c, vs) =>
      leaf.blooms.getOrElse(name, Nil).find(_.col == c)
        .forall(b => vs.exists(b.mightContain))
    }
    statOk && bloomOk
  }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // partition pruning: bind the pushed partition predicates to the
    // directory-derived values row and evaluate on the driver
    val bound = conjuncts(partitionFilters).map(_.transform {
      case a: AttributeReference =>
        BoundReference(partitionSchema.fieldIndex(a.name), a.dataType,
          nullable = false)
    })
    val (ranges, probes) = requirements(dataFilters)
    leaves
      .filter(l => bound.forall(_.eval(l.values) == true))
      .map { l =>
        PartitionDirectory(l.values,
          l.files.filter(f =>
            survives(f.getPath.getName, l, ranges, probes)).toArray)
      }
      .filter(_.files.nonEmpty)
  }
}

object GraftFileIndex {

  /** The manifest lake as a first-class Spark DataFrame: committed file
    * set, manifest-stat + bloom file skipping driven by ORDINARY
    * `filter`/SQL predicates (no explicit ranges map), Hive partition
    * columns and their pruning, stock vectorized parquet execution.
    * Refuses a table with active deletion vectors — a bare file scan
    * would resurrect deleted rows; read those via
    * [[ManifestCommit.readTableDV]] or compact with
    * [[ManifestCommit.applyDvs]] first. */
  def table(spark: SparkSession, tableRoot: String): DataFrame = {
    val index = new GraftFileIndex(spark, new Path(tableRoot))
    require(index.activeDvs.isEmpty,
      s"$tableRoot has active deletion vectors (${index.activeDvs.size} " +
        "sidecars) — use tableDV/readTableDV, or applyDvs to compact " +
        "them away")
    scanOf(spark, index, tableRoot)
  }

  /** The manifest lake as a first-class DataFrame UNDER active deletion
    * vectors — [[table]]'s Catalyst integration (ordinary WHERE
    * predicates answered from manifest stats/blooms/partition dirs,
    * stock vectorized parquet below) composed with the sidecar
    * anti-join, so a merge-on-read table keeps planner-driven file
    * skipping instead of falling back to the explicit-ranges
    * [[ManifestCommit.readTableWhereDV]]. Data predicates push BELOW
    * the anti-join (the join only adds `_metadata` refs), the sidecar
    * side is O(deleted rows) and broadcast, and positions key on
    * (file NAME, row index, partition columns) — names are unique
    * within a partition, and the partition-column equality keeps a
    * same-named adopted file in another Hive partition from
    * cross-matching. A DV-free table returns the plain [[table]] scan
    * unchanged. */
  def tableDV(spark: SparkSession, tableRoot: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    val index = new GraftFileIndex(spark, new Path(tableRoot))
    val plain = scanOf(spark, index, tableRoot)
    val dvLeaves = index.dvLeaves
    if (dvLeaves.isEmpty) return plain
    val dv = dvLeaves.map { case (dir, segs, names) =>
      val base = spark.read
        .parquet(names.map(n => new Path(dir, n).toString): _*)
        .select(col("file"), col("pos"))
      segs.foldLeft(base) { case (df, (c, v)) => df.withColumn(c, lit(v)) }
    }.reduce(_ unionByName _)
    val keyed = plain
      .withColumn("__dv_file", col("_metadata.file_name"))
      .withColumn("__dv_pos", col("_metadata.row_index"))
    val cond = dvLeaves.head._2.map(_._1)
      .foldLeft(keyed("__dv_file") === dv("file") &&
        keyed("__dv_pos") === dv("pos")) { (c, p) =>
        c && keyed(p) === dv(p)
      }
    keyed.join(broadcast(dv), cond, "left_anti")
      .drop("__dv_file", "__dv_pos")
  }

  /** The bare index-backed scan (no DV handling — callers guard). */
  private def scanOf(spark: SparkSession, index: GraftFileIndex,
      tableRoot: String): DataFrame = {
    val files = index.inputFiles
    require(files.nonEmpty, s"no live files under $tableRoot")
    // schema: the RECORDED manifest schema when every leaf carries one
    // (driver-side, zero footer reads — at 100 TB an unbounded footer
    // merge per table open would dominate a pruned point read); a
    // legacy table falls back to merging the NEWEST
    // [[ManifestCommit.SchemaFooterBound]] files' footers — newest
    // carry the additively-evolved schema, and inferring from one
    // arbitrary file silently drops columns absent from it
    val inferred = index.recordedSchema.getOrElse {
      spark.read.option("mergeSchema", "true")
        .parquet(files.takeRight(ManifestCommit.SchemaFooterBound)
          .toIndexedSeq: _*)
        .schema
    }
    val dataSchema = StructType(inferred
      .filterNot(f => index.partitionSchema.fieldNames.contains(f.name)))
    val relation = HadoopFsRelation(index, index.partitionSchema,
      dataSchema, None, new ParquetFileFormat, Map.empty)(spark)
    org.apache.spark.sql.graftbridge.GraftBridge.ofRows(spark,
      LogicalRelation(relation))
  }
}
