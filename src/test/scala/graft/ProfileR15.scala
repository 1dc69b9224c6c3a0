package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops._

/** Ad-hoc round-15 stage breakdowns (not a CI test). Usage:
  *   Test/runMain graft.ProfileR15 <section>
  * sections: sem (semanticClusters/q111), ivf (ivfTopK pieces),
  * recipe (q121), fert (q245), cc (connectedComponents). */
object ProfileR15 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val section = args.headOption.getOrElse("sem")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    def emb = Tables(spark, sf, "embeddings")
    def docs = Tables(spark, sf, "documents")
    // warm-up: JIT + codegen
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    section match {
      case "sem" =>
        for (i <- 1 to 2) {
          t(s"run$i ivfTopK(all)")(println("top rows=" +
            Similarity.ivfTopK(emb, nQueries = -1, k = 5, nprobe = 2,
              nCells = 8, trainIters = 2).count()))
          spark.catalog.clearCache()
          t(s"run$i semanticClusters")(println("rows=" +
            Similarity.semanticClusters(emb, tau = 0.4).count()))
          spark.catalog.clearCache()
        }
      case "ivf" =>
        for (i <- 1 to 2) {
          t(s"run$i cellAssignments")(println("rows=" +
            Similarity.cellAssignments(emb, 8, 2).count()))
          spark.catalog.clearCache()
        }
      case "recipe" =>
        for (i <- 1 to 2) {
          t(s"run$i fluencyBuckets")(println("rows=" +
            TextAnalysis.fluencyBuckets(docs.select(col("doc_id"),
              col("source"), TextAnalysis.normExpr(col("text")).as("text")))
              .count()))
          spark.catalog.clearCache()
          t(s"run$i pretrainRecipe")(println("rows=" +
            Curation.pretrainRecipe(docs, perSourceCap = 15).count()))
          spark.catalog.clearCache()
        }
      case "cc" =>
        val pairs = Dedup.minhashLshPairs(docs)
          .select(col("doc_a"), col("doc_b")).persist()
        t("pairs")(println("pairs=" + pairs.count()))
        for (i <- 1 to 3)
          t(s"cc run$i")(println("rows=" +
            Components.connectedComponents(pairs).count()))
      case other => sys.error(s"unknown section $other")
    }
    spark.stop()
  }
}
