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
          val normed = docs.select(col("doc_id"), col("source"),
            TextAnalysis.normExpr(col("text")).as("text")).persist()
          t(s"run$i normed")(normed.count())
          val keep = TextAnalysis.fluencyBuckets(normed)
            .filter(col("bucket") >= 1).select(col("doc_id")).persist()
          t(s"run$i keep")(println("keep=" + keep.count()))
          val gated = normed.join(keep, Seq("doc_id"))
          val capped = Curation.capPerKey(gated, "source", 15)
            .select(col("doc_id"))
            .join(normed, Seq("doc_id")).persist()
          t(s"run$i capped")(println("capped=" + capped.count()))
          val canonical = capped
            .groupBy(org.apache.spark.sql.functions.md5(col("text")).as("h"))
            .agg(min_by(struct(col("doc_id"), col("source"), col("text")),
              col("doc_id")).as("w"))
          t(s"run$i canonical")(println("canon=" + canonical.count()))
          spark.catalog.clearCache()
          t(s"run$i pretrainRecipe")(println("rows=" +
            Curation.pretrainRecipe(docs, perSourceCap = 15).count()))
          spark.catalog.clearCache()
        }
      case "fb" =>
        def noop(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        for (i <- 1 to 2) {
          val normed = docs.select(col("doc_id"), col("source"),
            TextAnalysis.normExpr(col("text")).as("text")).persist()
          normed.count()
          val bgc = normed.select(col("doc_id"),
              explode(when(size(split(col("text")," ")) >= 2, transform(sequence(lit(1), size(split(col("text")," ")) - 1), i => concat(element_at(split(col("text")," "), i), lit(" "), element_at(split(col("text")," "), (i + lit(1)).cast("int"))))).otherwise(array())).as("bg"))
            .groupBy(col("doc_id"), col("bg"))
            .agg(count(lit(1)).as("bf_doc")).persist()
          t(s"run$i bgc build+cache")(println("bgc=" + bgc.count()))
          val corpus = bgc.groupBy(col("bg")).agg(sum(col("bf_doc")).as("cbg"))
          t(s"run$i corpus agg noop")(noop(corpus))
          val pre = corpus.groupBy(split(col("bg"), " ").getItem(0).as("w1"))
            .agg(sum(col("cbg")).as("cpre"))
          t(s"run$i pre agg noop")(noop(pre))
          val sc = bgc.join(corpus, Seq("bg"))
            .join(pre, split(col("bg"), " ").getItem(0) === col("w1"))
            .groupBy(col("doc_id"))
            .agg(sum(col("bf_doc") * expr("(cbg * 1000000) div cpre")).as("mass"),
              sum(col("bf_doc")).as("nbg"))
          t(s"run$i score joins noop")(noop(sc))
          t(s"run$i bigramScore noop")(noop(
            TextAnalysis.bigramScore(normed)))
          val scored = TextAnalysis.bigramScore(normed)
            .select(col("doc_id"), col("fluency_ppm")).persist()
          scored.count()
          t(s"run$i bounds agg (cached scored)")(println(
            scored.agg(
              expr("percentile_disc(0.3333333333333333d) WITHIN GROUP (ORDER BY fluency_ppm)"),
              expr("percentile_disc(0.6666666666666666d) WITHIN GROUP (ORDER BY fluency_ppm)"))
              .collect().mkString))
          t(s"run$i fluencyBuckets noop")(noop(
            TextAnalysis.fluencyBuckets(normed)))
          spark.catalog.clearCache()
        }
      case "q106" =>
        for (i <- 1 to 2) {
          val ss = spark.newSession()
          ss.conf.set("spark.sql.shuffle.partitions", "4")
          val ix = t(s"run$i buildIvfPq") {
            val ix = Similarity.buildIvfPq(ss.read
              .parquet(s"$sf/embeddings.parquet")
              .select(col("vec_id"), col("embedding"))
              .filter(col("vec_id") % 10 =!= 0))
            ix.encoded.count(); ix
          }
          t(s"run$i stream q106 full")(println("rows=" +
            SparkEntry.queries("q106_stream_ivfpq")(spark, sf).count()))
          spark.catalog.clearCache()
        }
      case "q216" =>
        for (i <- 1 to 2) {
          t(s"run$i q216 full")(println("rows=" +
            SparkEntry.queries("q216_stream_ivfpq_maintain")(spark, sf)
              .count()))
          spark.catalog.clearCache()
        }
        // pieces: a cold buildIvfPq on the embeddings lake snapshot +
        // a search on the built index (the stream adds the feed apply)
        for (i <- 1 to 2) {
          val ss = spark.newSession()
          ss.conf.set("spark.sql.shuffle.partitions", "4")
          val ix = t(s"run$i buildIvfPq(lake-shaped)") {
            val ix = Similarity.buildIvfPq(ss.read
              .parquet(s"$sf/embeddings.parquet")
              .select(col("vec_id"), col("embedding")))
            ix.encoded.count(); ix
          }
          t(s"run$i searchIvfPqWith")(println("rows=" +
            Similarity.searchIvfPqWith(ix,
              ss.read.parquet(s"$sf/embeddings.parquet")
                .select(col("vec_id"), col("embedding"))
                .filter(col("vec_id") < 10)).count()))
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
