package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops._
import graft.ops.TextKit._

object ProfileQ23 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, "/root/testdata/sf0.1", "documents")
    val sh = Dedup.shingleSet(docs).persist()
    t("sh materialize")(sh.count())
    val mins = (0 until 8).map(j => min(md5Long(col("s"), Some(j))).as(s"h$j"))
    val sig = sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    t("sig count")(sig.count())
    t("sig count again")(sig.count())
    val banded = sig.select(col("doc_id"),
      explode(array((0 until 4).map(b => struct(lit(b).as("band"),
        concat_ws("_", col(s"h${2 * b}"), col(s"h${2 * b + 1}")).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
    val cand = banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b")).distinct()
    t("cand count")(cand.count())
    t("full q23")(Dedup.minhashLshPairs(docs).count())
    spark.stop()
  }
}
