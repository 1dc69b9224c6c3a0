package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Aggregation point for all oracle-gated queries. Sub-modules register
  * their (name -> query, name -> oracle SQL) pairs here; SparkEntry exposes
  * the union to the driver. */
object Queries {
  type Q = (SparkSession, String) => DataFrame

  // Map ++ silently keeps the LAST binding on a key collision — a reused
  // qNN name would silently DROP a query from the driver's run set and
  // shrink the correctness band with no error. Fail at first access.
  private def merged[V](parts: Seq[(String, Map[String, V])]): Map[String, V] = {
    val all = parts.flatMap { case (_, m) => m.keys }
    val dups = all.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty,
      s"duplicate query names across modules: ${dups.mkString(", ")}")
    parts.map(_._2).reduce(_ ++ _)
  }

  def all: Map[String, Q] = merged(Seq(
    "core" -> CoreQueries.queries, "ops" -> OpsQueries.queries,
    "stream" -> StreamQueries.queries, "ta" -> TaQueries.queries))

  def oracles: Map[String, String] = merged(Seq(
    "core" -> CoreQueries.oracles, "ops" -> OpsQueries.oracles,
    "stream" -> StreamQueries.oracles, "ta" -> TaQueries.oracles))
}
