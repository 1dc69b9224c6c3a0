package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextKit._

/** Approximate-nearest-neighbor search over an embedding column
  * (`embeddings(vec_id, embedding: array<float>, label)`).
  *
  * Two paths:
  *  - `bruteTopK`: exact cosine top-k — the correctness baseline. The query
  *    set is broadcast; the corpus side streams, so the cost is one scan of
  *    the corpus per batch of queries (fine at any corpus size when the
  *    query batch is bounded).
  *  - `lshTopK`: sign-bit LSH (axis hyperplanes): corpus and queries are
  *    bucketed by the sign pattern of the leading dimensions and only
  *    same-bucket pairs are scored — the 100 TB path: candidate generation
  *    is a bucket equi-join (shuffle on bucket id), never all-pairs.
  */
object Similarity {

  /** Quantize once per row (qv: array<bigint>) so pairwise scoring is a
    * codegen'd integer loop (LongArrayDot), not per-element lambdas. */
  private def withNorm(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding"),
        quantVec(col("embedding")).as("qv"))
      .withColumn("nsq", dotPre(col("qv"), col("qv")))

  /** Exact cosine top-k for the query rows (vec_id < nQueries), self
    * excluded; rank ties broken by candidate id. */
  def bruteTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val e = withNorm(emb)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("qv").as("qqv"),
        col("nsq").as("qnsq"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosineQ(dotPre(col("qqv"), col("qv")), col("qnsq"), col("nsq"))
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF (inverted-file) top-k: a deterministic coarse quantizer — every
    * 31st vector is a centroid — partitions the corpus into cells by
    * nearest centroid (exact integer squared-L2 via quantized dot
    * products); queries probe their `nprobe` nearest cells and score only
    * vectors assigned there. The 100 TB shape: the centroid set is tiny and
    * broadcast, cell assignment is one scan + one window, and search
    * shuffles only on cell id. A production build replaces the modulo
    * centroid choice with k-means — everything downstream is unchanged. */
  def ivfTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 3,
      nprobe: Int = 2, centroidStride: Int = 31): DataFrame = {
    val e = withNorm(emb)
    val cent = e.filter(col("vec_id") % centroidStride === 0)
      .select(col("vec_id").as("cent_id"), col("qv").as("cqv"),
        col("nsq").as("cnsq"))
    // squared L2 in quantized space: |a|^2 + |c|^2 - 2 a.c (exact integers)
    def distTo(nsq: Column, qv: Column): Column =
      nsq + col("cnsq") - lit(2L) * dotPre(qv, col("cqv"))
    // nearest centroid via min(struct(dist, cent_id)): a hash aggregation
    // with map-side combine instead of a per-vector window sort — the
    // shape that matters when assignment touches the whole corpus. qv/nsq
    // are functionally dependent on vec_id, so first() is deterministic.
    val assigned = e.join(broadcast(cent))
      .select(col("vec_id"), col("qv"), col("nsq"),
        struct(distTo(col("nsq"), col("qv")).as("dist"),
          col("cent_id").as("cid")).as("dc"))
      .groupBy(col("vec_id"))
      .agg(first(col("qv")).as("qv"), first(col("nsq")).as("nsq"),
        min(col("dc")).as("m"))
      .select(col("vec_id"), col("qv"), col("nsq"), col("m.cid").as("cell"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("qv").as("qqv"),
        col("nsq").as("qnsq"))
    // nprobe nearest cells per query: collect the (tiny) centroid distance
    // list, sort, slice — one aggregation + explode, no window shuffle
    val probes = q.join(broadcast(cent))
      .select(col("query_id"), col("qqv"), col("qnsq"),
        struct((col("qnsq") + col("cnsq") -
          lit(2L) * dotPre(col("qqv"), col("cqv"))).as("dist"),
          col("cent_id").as("cid")).as("dc"))
      .groupBy(col("query_id"))
      .agg(first(col("qqv")).as("qqv"), first(col("qnsq")).as("qnsq"),
        slice(sort_array(collect_list(col("dc"))), 1, nprobe).as("near"))
      .select(col("query_id"), col("qqv"), col("qnsq"),
        explode(col("near")).as("dc"))
      .select(col("query_id"), col("qqv"), col("qnsq"),
        col("dc.cid").as("cell"))
    val scored = probes.join(assigned, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosineQ(dotPre(col("qqv"), col("qv")), col("qnsq"), col("nsq"))
          .as("cosine"))
      // a vector can sit in only one cell, but two probed cells both join
      // the same (query, neighbor) never happens; distinct not needed
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(wTop)).filter(col("rank") <= k)
  }

  /** Sign-bit bucket id over the first `bits` dimensions. The sign of a
    * float is exact, so bucketing is engine-independent. */
  def signBucket(emb: org.apache.spark.sql.Column, bits: Int): org.apache.spark.sql.Column =
    (0 until bits).map(d =>
      when(element_at(emb, d + 1) >= 0, lit(1L << d)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** LSH-bucketed top-k: same contract as bruteTopK but candidates are
    * restricted to the query's bucket. Recall < 1 by construction; the
    * bucket join replaces the full scan. */
  def lshTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 3,
      bits: Int = 6): DataFrame = {
    val e = withNorm(emb).withColumn("bucket", signBucket(col("embedding"), bits))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("qv").as("qqv"),
        col("nsq").as("qnsq"), col("bucket"))
    val scored = e.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosineQ(dotPre(col("qqv"), col("qv")), col("qnsq"), col("nsq"))
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
