package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Aggregation point for all oracle-gated queries. Sub-modules register
  * their (name -> query, name -> oracle SQL) pairs here; SparkEntry exposes
  * the union to the driver. */
object Queries {
  type Q = (SparkSession, String) => DataFrame

  def all: Map[String, Q] =
    CoreQueries.queries ++ OpsQueries.queries ++ StreamQueries.queries ++
      TaQueries.queries

  def oracles: Map[String, String] =
    CoreQueries.oracles ++ OpsQueries.oracles ++ StreamQueries.oracles ++
      TaQueries.oracles
}
