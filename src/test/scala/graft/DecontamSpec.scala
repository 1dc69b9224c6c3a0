package graft

import org.apache.spark.sql.functions._

import graft.ops.Decontam

/** Decontamination (q232/q233): hand-built corpus with a known shared
  * passage — collision counts, ppm arithmetic, the short-doc edge, and
  * the bench slice's exclusion from the output. */
class DecontamSpec extends SparkSpec {
  import spark.implicits._

  // bench doc 100 carries the eval passage; corpus doc 1 quotes it
  // verbatim (8 shared 4-grams of the 11-token passage), doc 2 shares
  // nothing, doc 3 is too short to form a 4-gram at all
  private val passage = "alpha beta gamma delta epsilon zeta eta " +
    "theta iota kappa lambda"
  private lazy val docs = Seq(
    (100L, s"eval question: $passage", "bench", "b"),
    (1L, s"student notes quoting $passage end", "web", "w"),
    (2L, "totally unrelated prose with many plain words here", "web", "w"),
    (3L, "too short", "web", "w"))
    .toDF("doc_id", "text", "lang", "source")
    .withColumn("n_chars", length(col("text")))
    .select("doc_id", "text", "lang", "source", "n_chars")

  test("collisions counted, clean and short docs survive with zeros") {
    val r = Decontam.contamination(docs, col("doc_id") === 100L, n = 4)
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r.keySet == Set(1L, 2L, 3L)) // bench doc excluded
    // doc 1: the 11 passage tokens yield 8 4-gram windows, all shared
    assert(r(1L).getAs[Long]("n_hit") == 8L)
    assert(r(1L).getAs[Int]("contaminated") == 1)
    // ppm = hits * 1e6 div distinct grams (integer div, exact)
    val g1 = r(1L).getAs[Long]("n_grams")
    assert(r(1L).getAs[Long]("hit_ppm") == 8L * 1000000L / g1)
    assert(r(2L).getAs[Long]("n_hit") == 0L)
    assert(r(2L).getAs[Int]("contaminated") == 0)
    // short doc: zero windows, zero ppm, not contaminated
    assert(r(3L).getAs[Long]("n_grams") == 0L)
    assert(r(3L).getAs[Long]("hit_ppm") == 0L)
    assert(r(3L).getAs[Int]("contaminated") == 0)
  }

  test("minHits threshold gates the flag without changing the counts") {
    val strict = Decontam.contamination(docs, col("doc_id") === 100L,
        n = 4, minHits = 9)
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(strict(1L).getAs[Long]("n_hit") == 8L)
    assert(strict(1L).getAs[Int]("contaminated") == 0)
  }

  test("report rolls up per source with integer ppm") {
    val rep = Decontam.report(docs, col("doc_id") === 100L, n = 4)
      .collect().map(x => x.getAs[String]("source") -> x).toMap
    assert(rep.keySet == Set("w"))
    assert(rep("w").getAs[Long]("n_docs") == 3L)
    assert(rep("w").getAs[Long]("n_contaminated") == 1L)
    assert(rep("w").getAs[Long]("total_hits") == 8L)
    assert(rep("w").getAs[Long]("contaminated_ppm") == 1000000L / 3L)
  }

  test("semantic decontamination: verbatim embedding flags, orthogonal " +
      "survives, argmax picks the closest bench item") {
    val emb = Seq(
      (100L, Array(1f, 0f, 0f)),   // bench A
      (101L, Array(0f, 1f, 0f)),   // bench B
      (1L, Array(1f, 0f, 0f)),     // exact copy of bench A -> cos 1
      (2L, Array(0f, 0.9f, 0.1f)), // near bench B
      (3L, Array(0f, 0f, 1f)))     // orthogonal to both
      .toDF("vec_id", "embedding")
    val r = Decontam.semanticContamination(emb,
        col("vec_id") >= 100L, tau = 0.5)
      .collect().map(x => x.getAs[Long]("vec_id") -> x).toMap
    assert(r.keySet == Set(1L, 2L, 3L)) // bench slice excluded
    assert(r(1L).getAs[Long]("bench_id") == 100L)
    assert(r(1L).getAs[Double]("max_cos") == 1.0)
    assert(r(1L).getAs[Int]("contaminated") == 1)
    assert(r(2L).getAs[Long]("bench_id") == 101L)
    assert(r(2L).getAs[Int]("contaminated") == 1)
    assert(r(3L).getAs[Double]("max_cos") == 0.0)
    assert(r(3L).getAs[Int]("contaminated") == 0)
    // cos-0 tie against both bench items breaks to the SMALLER id
    assert(r(3L).getAs[Long]("bench_id") == 100L)
    graft.ops.TextKit.releaseCaches()
  }
}
