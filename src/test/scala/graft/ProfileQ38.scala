package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._

object ProfileQ38 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs0 = Tables(spark, "/root/testdata/sf0.1", "documents")
    val hot = docs0.select(col("doc_id"),
      when(col("doc_id") % 10 === 0, lit("the quick brown fox jumps over the lazy dog again and again"))
        .otherwise(col("text")).as("text"))
    val sh = Dedup.shingleSet(hot).persist()
    t("sh materialize")(sh.count())
    val sig = Dedup.minhashSignatures(hot)
    t("sig count")(sig.count())
    t("full q38")(Dedup.minhashLshPairs(hot).count())
    spark.catalog.clearCache()
    t("full q38 uncached")(Dedup.minhashLshPairs(hot).count())
    t("full q23")(Dedup.minhashLshPairs(docs0).count())
    spark.stop()
  }
}
