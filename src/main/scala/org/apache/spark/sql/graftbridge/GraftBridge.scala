package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to Column <-> Expression conversions, which Spark 4 marks
  * private[sql] (org.apache.spark.sql.classic.ExpressionUtils). Lives under
  * the spark.sql package solely to satisfy that access modifier; contains
  * no Spark-internal logic of its own. */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a temp function on an ALREADY-RUNNING session (withExtensions
    * only applies to sessions built after it; sessionState is private[sql],
    * hence this bridge). */
  def registerTempFunction(spark: org.apache.spark.sql.SparkSession,
      name: String, builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
