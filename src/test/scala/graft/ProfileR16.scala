package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.ops._

/** Ad-hoc round-16 stage breakdowns (not a CI test). Usage:
  *   Test/runMain graft.queries.ProfileR16 <section>
  * sections: s216 (streamFeedIvfPqMaintain), s106 (streamIvfPqAdmission),
  * s212 (streamFeedIndexMaintain), s129 (streamBpeCounts). */
object ProfileR16 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    System.setProperty("graft.prof", "1")
    val section = args.headOption.getOrElse("s216")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    def emb = Tables(spark, sf, "embeddings")
    // warm-up: JIT + codegen
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    section match {
      case "s216" =>
        val el = OpsQueries.ensureEmbLake(spark, sf)
        for (i <- 1 to 2) {
          // cold build piece
          val ix0 = t(s"run$i buildIvfPq")(Similarity.buildIvfPq(
            graft.lake.ManifestCommit.readTableAt(spark, el.path, el.fromV)))
          t(s"run$i write e+enc") {
            ix0.e.write.mode("overwrite").parquet("/tmp/prof216/e")
            ix0.encoded.write.mode("overwrite").parquet("/tmp/prof216/enc")
          }
          spark.catalog.clearCache()
          // whole op
          val ix = t(s"run$i streamFeedIvfPqMaintain")(
            graft.streaming.StreamingOps.streamFeedIvfPqMaintain(
              spark, el.path, el.fromV))
          t(s"run$i search tail")(println("rows=" +
            Similarity.searchIvfPqWith(ix,
                emb.filter(col("vec_id") < 10))
              .orderBy("query_id", "rank").count()))
          spark.catalog.clearCache()
        }
      case "s216x" =>
        // streamFeedIvfPqMaintain with per-stage timers (mirror copy)
        val el = OpsQueries.ensureEmbLake(spark, sf)
        import graft.sources.FeedSource
        for (i <- 1 to 2) {
          val t0 = System.nanoTime()
          val ss = spark.newSession()
          ss.conf.set("spark.sql.shuffle.partitions", "4")
          val stateDir = java.nio.file.Files
            .createTempDirectory("prof-feedivf").toString
          val (m, codesPerSub) = (8, 16)
          val ix0 = t(s"run$i cold buildIvfPq")(Similarity.buildIvfPq(
            graft.lake.ManifestCommit.readTableAt(ss, el.path, el.fromV)))
          var frozenCents = ix0.centsCache
          var frozenCb = ix0.cbCache
          t(s"run$i cold writes") {
            ix0.cent.write.mode("overwrite").parquet(s"$stateDir/cent")
            ix0.codebook.write.mode("overwrite").parquet(s"$stateDir/cb")
            ix0.e.write.mode("overwrite").parquet(s"$stateDir/v${el.fromV}/e")
            ix0.encoded.write.mode("overwrite").parquet(s"$stateDir/v${el.fromV}/enc")
          }
          val cur = new java.util.concurrent.atomic.AtomicLong(el.fromV)
          val tStream0 = System.nanoTime()
          ss.readStream.format("graft.sources.FeedSource")
            .option("path", el.path)
            .option("fromVersion", el.fromV.toString)
            .load()
            .writeStream
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
              t(s"run$i batch body") {
                val b = batch.persist()
                try if (t(s"run$i  head")(b.head(1)).nonEmpty) {
                  val v = t(s"run$i  maxv")(
                    b.agg(max(col(FeedSource.VersionCol))).head.getLong(0))
                  val prev = {
                    val ixr = Similarity.IvfPqIndex(
                      ss.read.parquet(s"$stateDir/v${cur.get}/e"),
                      ss.read.parquet(s"$stateDir/cent"),
                      ss.read.parquet(s"$stateDir/cb"),
                      ss.read.parquet(s"$stateDir/v${cur.get}/enc"),
                      m, codesPerSub, 8)
                    ixr.centsCache = frozenCents
                    ixr.cbCache = frozenCb
                    ixr
                  }
                  val (delW, insW) = graft.streaming.StreamingOps
                    .nettedWindow(b, "vec_id")
                  val nxt = t(s"run$i  apply")(Similarity.applyFeedToIvfPq(prev,
                    insW.select("vec_id", "embedding"),
                    delW.select("vec_id")))
                  t(s"run$i  write e")(nxt.e.write.mode("overwrite")
                    .parquet(s"$stateDir/v$v/e"))
                  t(s"run$i  write enc")(nxt.encoded.write.mode("overwrite")
                    .parquet(s"$stateDir/v$v/enc"))
                  cur.set(v)
                } finally { b.unpersist(); () }
              }
              ()
            }
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
            .awaitTermination()
          println(f"PROF run$i stream total ${(System.nanoTime() - tStream0) / 1e9}%.2f s")
          val ixF = Similarity.IvfPqIndex(
            spark.read.parquet(s"$stateDir/v${cur.get}/e"),
            spark.read.parquet(s"$stateDir/cent"),
            spark.read.parquet(s"$stateDir/cb"),
            spark.read.parquet(s"$stateDir/v${cur.get}/enc"),
            m, codesPerSub, 8)
          ixF.centsCache = frozenCents
          ixF.cbCache = frozenCb
          t(s"run$i search tail")(println("rows=" +
            Similarity.searchIvfPqWith(ixF, emb.filter(col("vec_id") < 10))
              .orderBy("query_id", "rank").count()))
          println(f"PROF run$i WHOLE ${(System.nanoTime() - t0) / 1e9}%.2f s")
          spark.catalog.clearCache()
        }
      case "s106" =>
        for (i <- 1 to 2) {
          val ix = t(s"run$i buildIvfPq(90%)")(Similarity.buildIvfPq(
            spark.read.parquet(s"$sf/embeddings.parquet")
              .filter(col("vec_id") % 10 =!= 0)))
          t(s"run$i enc materialize")(println(ix.encoded.count()))
          spark.catalog.clearCache()
          t(s"run$i whole q106")(println("rows=" +
            graft.streaming.StreamingOps.streamIvfPqAdmission(spark, sf,
              maxAdc = 125000000000000L).count()))
          spark.catalog.clearCache()
        }
      case "s212" =>
        val dl = OpsQueries.ensureDocLake(spark, sf)
        for (i <- 1 to 2) {
          t(s"run$i bandIndexRaw(base)")(println(
            Dedup.bandIndexRaw(
              graft.lake.ManifestCommit.readTableAt(spark, dl.path, dl.fromV))
              .count()))
          spark.catalog.clearCache()
          t(s"run$i whole q212")(println("rows=" +
            graft.streaming.StreamingOps
              .streamFeedIndexMaintain(spark, dl.path, dl.fromV).count()))
          spark.catalog.clearCache()
        }
      case "s212x" =>
        val dl = OpsQueries.ensureDocLake(spark, sf)
        import graft.sources.FeedSource
        for (i <- 1 to 2) {
          val t0 = System.nanoTime()
          val ss = spark.newSession()
          ss.conf.set("spark.sql.shuffle.partitions", "4")
          val stateDir = java.nio.file.Files
            .createTempDirectory("prof-feedix").toString
          t(s"run$i cold bandIndexRaw+write")(
            Dedup.bandIndexRaw(
                graft.lake.ManifestCommit.readTableAt(ss, dl.path, dl.fromV))
              .write.parquet(s"$stateDir/v${dl.fromV}"))
          val cur = new java.util.concurrent.atomic.AtomicLong(dl.fromV)
          val tS = System.nanoTime()
          ss.readStream.format("graft.sources.FeedSource")
            .option("path", dl.path)
            .option("fromVersion", dl.fromV.toString)
            .load()
            .writeStream
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
              t(s"run$i batch body") {
                val b = batch.persist()
                val vRow = t(s"run$i  maxv")(
                  b.agg(max(col(FeedSource.VersionCol))).head)
                try if (!vRow.isNullAt(0)) {
                  val v = vRow.getLong(0)
                  val prev = ss.read.parquet(s"$stateDir/v${cur.get}")
                  val (delW, insW) = graft.streaming.StreamingOps
                    .nettedWindow(b, "doc_id")
                  val next = t(s"run$i  applyFeed define")(
                    Dedup.applyFeedToBandIndex(prev,
                      insW.select("doc_id", "text"),
                      delW.select("doc_id", "text"),
                      graft.lake.ManifestCommit.readTableAt(ss, dl.path, v)))
                  t(s"run$i  write state")(
                    next.write.parquet(s"$stateDir/v$v"))
                  cur.set(v)
                } finally { b.unpersist(); () }
              }
              ()
            }
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
            .awaitTermination()
          println(f"PROF run$i stream total ${(System.nanoTime() - tS) / 1e9}%.2f s")
          t(s"run$i readback count")(println(
            spark.read.parquet(s"$stateDir/v${cur.get}").count()))
          println(f"PROF run$i WHOLE ${(System.nanoTime() - t0) / 1e9}%.2f s")
          spark.catalog.clearCache()
        }
      case "cg" =>
        // which stages of q84's plan whole-stage-compile? (execute first:
        // AQE final plans only exist after execution)
        val df = SparkEntry.queries(args.lift(1).getOrElse("q84_ann_pq"))(spark, sf)
        df.collect()
        val txt = df.queryExecution.executedPlan.toString
        println("WSCG spans: " + "WholeStageCodegen".r.findAllIn(txt).length)
        txt.linesIterator.take(80).foreach(l => println("PLAN|" + l))
      case "cc" =>
        System.setProperty("graft.cc.debug", "1")
        for (q <- Seq("q43_dedup_components", "q200_kcore",
            "q64_components_stars", "q213_label_prop", "q133_dup_pagerank",
            "q114_cluster_cap")) {
          t(s"$q run1")(SparkEntry.queries(q)(spark, sf).count())
          spark.catalog.clearCache()
          t(s"$q run2")(SparkEntry.queries(q)(spark, sf).count())
          spark.catalog.clearCache()
        }
      case "s129" =>
        for (i <- 1 to 2) {
          val corpus = spark.read.parquet(s"$sf/documents.parquet")
            .select(col("doc_id"), col("text"))
          t(s"run$i bpe train")(Bpe.train(corpus))
          TextKit.releaseCaches()
          spark.catalog.clearCache()
          t(s"run$i whole q129")(println("rows=" +
            graft.streaming.StreamingOps.streamBpeCounts(spark, sf).count()))
          spark.catalog.clearCache()
        }
    }
    spark.stop()
  }
}
