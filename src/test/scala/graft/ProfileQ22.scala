package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._
object ProfileQ22 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROF $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, "/root/testdata/sf0.1", "documents")
    val sh = Dedup.shingleSet(docs)
    t("shingleSet count")(sh.count())
    val shp = sh.persist()
    t("persist materialize")(shp.count())
    val rare = shp.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= 20 && col("df") >= 2)
    t("rare count")(rare.count())
    val candSh = shp.join(rare.select("s"), "s")
    t("candSh count")(candSh.count())
    val cand = candSh.as("l").join(candSh.as("r"),
      col("l.s") === col("r.s") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b")).distinct()
    t("cand count")(cand.count())
    val full = Dedup.ngramJaccardPairs(docs)
    t("full q22")(full.count())
    spark.stop()
  }
}
