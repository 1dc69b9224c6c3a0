package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops._

/** Ad-hoc stage breakdown for the components pipeline (not a CI test). */
object ProfileQ43 {
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
    val pairs = Dedup.minhashLshPairs(docs).select(col("doc_a"), col("doc_b"))
      .persist()
    t("pairs count")(println("pairs=" + pairs.count()))
    t("distinct nodes")(println("nodes=" +
      pairs.select(col("doc_a").as("id"))
        .union(pairs.select(col("doc_b"))).distinct().count()))
    t("cc")(println("cc rows=" +
      Components.connectedComponents(pairs).count()))
    t("cc again")(println("cc rows=" +
      Components.connectedComponents(pairs).count()))
    spark.stop()
  }
}
