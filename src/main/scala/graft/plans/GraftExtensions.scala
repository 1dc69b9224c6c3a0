package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{LongArrayDot, Md5Long60, WordShingles}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions so `spark.sql` users (and the view layer)
  * can call them without touching the Scala API.
  *
  * Usage:
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * // or: spark.sql.extensions=graft.plans.GraftExtensions
  * spark.sql("SELECT long_array_dot(a, b), word_shingles(text, 2) ...")
  * }}}
  *
  * No custom optimizer Rule or SparkStrategy is registered: per SURVEY.md §4
  * every reference operator maps onto existing Spark physical operators, and
  * the one candidate rule (empty-tags left-join elision) is already covered
  * by Spark's built-in PropagateEmptyRelation plus the view builder's
  * build-time probe (J2).
  */
object GraftExtensions {
  /** Late registration on an existing session — withExtensions only takes
    * effect for sessions created after it, so long-lived apps (and shared
    * test sessions) attach the functions this way. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.graftbridge.GraftBridge.registerTempFunction
    registerTempFunction(spark, "long_array_dot",
      (children: Seq[Expression]) => LongArrayDot(children(0), children(1)))
    registerTempFunction(spark, "word_shingles",
      (children: Seq[Expression]) => {
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"word_shingles width must be a literal, got $other")
        }
        WordShingles(children(0), n)
      })
    registerTempFunction(spark, "md5_long60",
      (children: Seq[Expression]) => Md5Long60(children(0)))
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("long_array_dot"),
      info("long_array_dot",
        "long_array_dot(a, b) - exact integer dot product of two array<bigint>"),
      (children: Seq[Expression]) =>
        LongArrayDot(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      info("word_shingles",
        "word_shingles(text, n) - word n-gram shingles of a space-tokenized string"),
      (children: Seq[Expression]) => {
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"word_shingles width must be a literal, got $other")
        }
        WordShingles(children(0), n)
      }))
    ext.injectFunction((
      FunctionIdentifier("md5_long60"),
      info("md5_long60",
        "md5_long60(s) - first 15 hex digits of md5(s) as a non-negative BIGINT"),
      (children: Seq[Expression]) => Md5Long60(children(0))))
  }
}
