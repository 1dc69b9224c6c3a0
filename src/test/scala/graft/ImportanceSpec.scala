package graft

import org.apache.spark.sql.functions._

import graft.ops.Importance

/** Selection behavior the q132 oracle can't see: documents that SHARE the
  * target domain's n-grams must outscore off-domain documents even when
  * held out of the target set — the point of importance resampling. */
class ImportanceSpec extends SparkSpec {

  import spark.implicits._

  // Target domain: docs 0..19 (flagged) + held-out twins 100..119 use
  // vocabulary A; off-domain docs 200..219 use vocabulary B.
  private def textA(i: Long) =
    s"the quick brown fox ${i % 3} jumps over the lazy dog near the river bank"
  private def textB(i: Long) =
    s"zorp blag ${i % 3} quux flim wibble zorp blag snark frop wibble quux"

  private lazy val docs = (
    (0L until 20L).map(i => (i, textA(i))) ++
    (100L until 120L).map(i => (i, textA(i))) ++
    (200L until 220L).map(i => (i, textB(i))) ++
    Seq((300L, "short"))
  ).toDF("doc_id", "text")

  private lazy val scored = Importance
    .resample(docs, col("doc_id") < 20, k = 40)
    .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap

  test("held-out on-domain docs outscore every off-domain doc") {
    val heldOut = (100L until 120L).map(scored(_)._1)
    val offDom = (200L until 220L).map(scored(_)._1)
    assert(heldOut.min > offDom.max,
      s"held-out min ${heldOut.min} vs off-domain max ${offDom.max}")
  }

  test("top-k admission keeps exactly the on-domain docs") {
    val kept = scored.collect { case (id, (_, true)) => id }.toSet
    assert(kept == ((0L until 20L) ++ (100L until 120L)).toSet)
  }

  test("featureless doc scores zero and is never admitted") {
    assert(scored(300L) == (0L, false))
  }

  test("drift: identical slices read 0, disjoint vocabularies read ~1e6") {
    // the same slice on both sides -> identical distributions, zero TVD
    val same = Importance.driftSummary(docs,
      col("doc_id") < 20, col("doc_id") < 20)
      .collect().head
    assert(same.getAs[Long]("tvd_ppm") == 0L,
      s"identical slices must have zero drift: $same")
    // near-twins (same template, slightly different digit-token mix)
    // must read small-but-nonzero drift — the monitor's sensitivity
    val twin = Importance.driftSummary(docs,
      col("doc_id") < 20, col("doc_id") >= 100 && col("doc_id") < 120)
      .collect().head
    assert(twin.getAs[Long]("tvd_ppm") > 0L &&
      twin.getAs[Long]("tvd_ppm") < 50000L,
      s"near-twin slices must read small nonzero drift: $twin")
    // vocabulary-A slice vs vocabulary-B slice -> near-total drift
    // (hash collisions across 256 buckets keep it just under 1e6)
    val far = Importance.driftSummary(docs,
      col("doc_id") < 20, col("doc_id") >= 200 && col("doc_id") < 220)
      .collect().head
    assert(far.getAs[Long]("tvd_ppm") > 900000L,
      s"disjoint vocabularies must read near-total drift: $far")
    // monotone signal: a half-swapped slice drifts less than disjoint
    val mid = Importance.driftSummary(docs,
      col("doc_id") < 20,
      (col("doc_id") >= 100 && col("doc_id") < 110) ||
        (col("doc_id") >= 200 && col("doc_id") < 210))
      .collect().head
    assert(mid.getAs[Long]("tvd_ppm") > 0L &&
      mid.getAs[Long]("tvd_ppm") < far.getAs[Long]("tvd_ppm"),
      s"mixed slice must drift strictly between: $mid vs $far")
  }
}
