package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops._

/** Ad-hoc stage breakdown for the minhash LSH pipeline (not a CI test). */
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
    val shm = Dedup.shingleHashes(docs).persist()
    t("shm materialize")(shm.count())
    val mins = (0 until 8).map(j => min(Dedup.slotHash(col("m"), j)).as(s"h$j"))
    val sig = shm.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    t("sig count")(sig.count())
    t("sig count again")(sig.count())
    val banded = sig.select(col("doc_id"),
      explode(array((0 until 4).map(b => struct(lit(b).as("band"),
        (col(s"h${2 * b}") * lit(Dedup.P) + col(s"h${2 * b + 1}")).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
    val buckets = banded.groupBy(col("band"), col("key"))
      .agg(BoundedMinSet(65, col("doc_id")).as("ids"))
      .filter(size(col("ids")).between(2, 64)).persist()
    t("buckets count")(buckets.count())
    t("buckets again")(buckets.count())
    shm.unpersist(); buckets.unpersist()
    t("full q23 cold")(Dedup.minhashLshPairs(docs).count())
    TextKit.releaseCaches()
    t("full q23 again")(Dedup.minhashLshPairs(docs).count())
    spark.stop()
  }
}
