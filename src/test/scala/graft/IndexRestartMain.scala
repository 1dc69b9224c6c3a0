package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Two-process durability drive for the PERSISTED IVF-PQ index — the
  * q51-q59 catalog-restart contract applied to ANN state: `write` builds
  * the index on the 495-vector corpus prefix, persists its four
  * relations to plain parquet, answers an external-query batch (the 5
  * held-out vectors), records the answers, and EXITS; `read` is a
  * brand-new JVM whose only state is the parquet on disk — it must
  * reconstruct the index cold and answer the same batch BIT-EQUAL. This
  * is the production index lifecycle: build once, persist next to the
  * corpus, serve query batches from any later session without
  * retraining. Orchestrated by [[IndexRestartSpec]] (separate processes
  * are the honest restart). */
object IndexRestartMain {
  def main(args: Array[String]): Unit = {
    val Array(mode, work) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-ixrestart-$mode")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val emb = spark.read
        .parquet("/root/testdata/sf0.001/embeddings.parquet")
      val corpus = emb.filter(col("vec_id") < 495)
      val fresh = emb.filter(col("vec_id") >= 495)
      if (mode == "write") {
        val ix = Similarity.buildIvfPq(corpus, nCells = 4)
        ix.e.write.mode("overwrite").parquet(s"$work/ix/e")
        ix.cent.write.mode("overwrite").parquet(s"$work/ix/cent")
        ix.codebook.write.mode("overwrite").parquet(s"$work/ix/codebook")
        ix.encoded.write.mode("overwrite").parquet(s"$work/ix/encoded")
        Similarity.searchIvfPqWith(ix, fresh, k = 5)
          .orderBy("query_id", "rank")
          .write.mode("overwrite").parquet(s"$work/expected")
        println("WRITE_OK")
      } else {
        // COLD index: nothing carried over from the build JVM — the four
        // relations come back from the lake alone (m/codesPerSub/subDim
        // are deployment constants, like a table schema)
        val ix = Similarity.IvfPqIndex(
          spark.read.parquet(s"$work/ix/e"),
          spark.read.parquet(s"$work/ix/cent"),
          spark.read.parquet(s"$work/ix/codebook"),
          spark.read.parquet(s"$work/ix/encoded"),
          m = 8, codesPerSub = 16, subDim = 8)
        val got = Similarity.searchIvfPqWith(ix, fresh, k = 5)
          .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
        val want = spark.read.parquet(s"$work/expected")
          .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
        require(got.nonEmpty, "restarted search returned no rows")
        require(got == want,
          "reloaded index answers diverged from the build session's")
        println(s"RESTART_OK rows=${got.size}")
      }
    } finally spark.stop()
  }
}
