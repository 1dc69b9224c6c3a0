package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Retrieval-quality gate for the ANN family. Hash-determinism (the
  * DuckDB oracles on q26/q27/q36/q84/q87/q94/q95) proves every search is
  * REPEATABLE; this spec measures whether the approximate searches
  * actually FIND the true neighbors — recall@k against [[bruteTopK]] on
  * the real embeddings fixture — and pins floors so a refactor that
  * silently degrades retrieval quality (a broken bucket id, a
  * mis-sliced subvector, a bad centroid update) fails here even if it
  * stays deterministic. Floors are set ~0.05 below the measured value
  * (measured on sf0.001: see BASELINE.md's recall table) so host noise
  * can't flake them while a structural regression still trips.
  */
class RecallSpec extends SparkSpec {

  private val sfDir =
    sys.env.getOrElse("SPARK_GRAFT_RECALL_SF", "/root/testdata/sf0.001")

  private lazy val emb = spark.read
    .parquet(s"$sfDir/embeddings.parquet").cache()

  private val nQ = 10
  private val k = 10

  private lazy val exact = Similarity.bruteTopK(emb, nQueries = nQ, k = k)
    .cache()

  private def recall(approx: org.apache.spark.sql.DataFrame): Double =
    Similarity.meanRecall(approx, exact)

  test("recallAtK: exact-vs-exact is 1000 permille for every query") {
    val r = Similarity.recallAtK(exact, exact).collect()
    assert(r.length == nQ)
    assert(r.forall(_.getAs[Long]("recall_permille") == 1000L))
  }

  test("ANN recall floors: every approximate search finds most true neighbors") {
    val lsh = recall(Similarity.lshTopK(emb, nQueries = nQ, k = k, bits = 6))
    val ivf2 = recall(Similarity.ivfTopK(emb, nQueries = nQ, k = k,
      nprobe = 2, nCells = 8))
    val ivf4 = recall(Similarity.ivfTopK(emb, nQueries = nQ, k = k,
      nprobe = 4, nCells = 8))
    val pq = recall(Similarity.pqTopK(emb, nQueries = nQ, k = k))
    val pqT = recall(Similarity.pqTopK(emb, nQueries = nQ, k = k,
      trainIters = 2))
    val ivfpq2 = recall(Similarity.ivfPqTopK(emb, nQueries = nQ, k = k,
      nprobe = 2))
    val ivfpq4 = recall(Similarity.ivfPqTopK(emb, nQueries = nQ, k = k,
      nprobe = 4))
    val lshM = recall(Similarity.lshTopK(emb, nQueries = nQ, k = k,
      bits = 6, tables = 8))
    val pqR = recall(Similarity.pqTopK(emb, nQueries = nQ, k = k,
      rerank = 50))
    val ivfpqR = recall(Similarity.ivfPqTopK(emb, nQueries = nQ, k = k,
      nprobe = 4, rerank = 50))
    val ivfpqTR = recall(Similarity.ivfPqTopK(emb, nQueries = nQ, k = k,
      nprobe = 4, rerank = 50, cbTrainIters = 2))
    val sq8 = recall(Similarity.sq8TopK(emb, nQueries = nQ, k = k,
      shortlist = 50))
    val mat = recall(Similarity.matryoshkaTopK(emb, nQueries = nQ, k = k,
      dPrefix = 16, shortlist = 50))
    val bin = recall(Similarity.binaryTopK(emb, nQueries = nQ, k = k,
      shortlist = 50))
    info(f"recall@$k on $sfDir: lsh=$lsh%.3f ivf2=$ivf2%.3f ivf4=$ivf4%.3f " +
      f"pq=$pq%.3f pqT=$pqT%.3f ivfpq2=$ivfpq2%.3f ivfpq4=$ivfpq4%.3f " +
      f"lshM8=$lshM%.3f pqR50=$pqR%.3f ivfpq4R50=$ivfpqR%.3f " +
      f"ivfpq4TR50=$ivfpqTR%.3f sq8R50=$sq8%.3f mat16R50=$mat%.3f " +
      f"binR50=$bin%.3f")
    // floors: measured-minus-margin (see BASELINE.md recall table). The
    // fixture embeddings are near-ISOTROPIC (mean pairwise cosine ~0,
    // std 0.125, top-1 ~0.37) — the adversarial regime where neighbors
    // barely stand out from noise, so absolute recall is structurally
    // modest here; the clustered-corpus test below covers the regime ANN
    // actually operates in. Floors still catch a real regression (a
    // broken bucket id or mis-sliced subvector drops these to ~k/n).
    assert(lsh >= 0.02, f"LSH recall collapsed: $lsh%.3f")
    assert(ivf2 >= 0.40, f"IVF nprobe=2 recall collapsed: $ivf2%.3f")
    assert(ivf4 >= 0.60, f"IVF nprobe=4 recall collapsed: $ivf4%.3f")
    assert(pq >= 0.08, f"PQ recall collapsed: $pq%.3f")
    assert(pqT >= 0.10, f"trained-PQ recall collapsed: $pqT%.3f")
    assert(ivfpq2 >= 0.08, f"IVF-PQ nprobe=2 recall collapsed: $ivfpq2%.3f")
    assert(ivfpq4 >= 0.08, f"IVF-PQ nprobe=4 recall collapsed: $ivfpq4%.3f")
    // the recall LEVERS must actually lift recall well above the raw
    // single-table / ADC-only forms
    assert(lshM >= 0.20, f"multi-table LSH recall collapsed: $lshM%.3f")
    assert(lshM > lsh, "8-table LSH must beat single-table")
    assert(pqR >= 0.35, f"PQ+rerank recall collapsed: $pqR%.3f")
    assert(pqR > pq, "exact re-rank must beat raw ADC ranking")
    assert(ivfpqR >= 0.30, f"IVF-PQ+rerank recall collapsed: $ivfpqR%.3f")
    assert(ivfpqR > ivfpq4, "exact re-rank must beat raw ADC ranking")
    assert(ivfpqTR >= 0.30,
      f"trained IVF-PQ+rerank recall collapsed: $ivfpqTR%.3f")
    // SQ8's 8-bit code dot tracks the true dot closely (per-dim affine
    // error only), so shortlist-50 + exact rerank should sit near the
    // top of the approximate family even on the isotropic fixture
    // (measured 1.00 at shortlist 50); the
    // 16-of-64-dim matryoshka prefix keeps ~1/4 of the signal
    assert(sq8 >= 0.90, f"SQ8+rerank recall collapsed: $sq8%.3f")
    assert(mat >= 0.45, f"matryoshka recall collapsed: $mat%.3f")
    // 1 bit/dim keeps only the sign pattern — the 64-bit Hamming
    // distance is the SimHash angular estimate, so on the isotropic
    // fixture it behaves like a strong-but-lossy shortlist; floor set
    // measured-minus-margin like the rest
    assert(bin >= 0.30, f"binary+rerank recall collapsed: $bin%.3f")
    // IVF candidates at nprobe=4 are a superset of nprobe=2's and scoring
    // is the exact cosine, so recall is provably monotone in nprobe (a
    // true top-k neighbor can only be displaced by another true top-k
    // neighbor). The PQ variants rank by approximate ADC, so monotonicity
    // is expected but not guaranteed — the floors above cover them.
    assert(ivf4 >= ivf2,
      f"IVF recall must be monotone in nprobe: $ivf4%.3f < $ivf2%.3f")
  }

  test("clustered corpus: compressed + re-ranked searches find the true twins") {
    import spark.implicits._
    // 100 well-separated cluster centers x 5 tightly-perturbed members —
    // the regime semantic retrieval actually runs in (clustered
    // embedding space). The center construction is deliberately
    // NON-separable (sin((c+1)(d+1)(d+3)K)) so centers span full rank
    // with max inter-center cosine ~0.40 — a separable sin(f(c)+g(d))
    // would put every center on a rank-2 manifold with near-parallel
    // pairs. Exact top-4 of a query is its 4 cluster twins
    // (intra-cluster cosine ~0.999), so recall here measures whether
    // the index RELIABLY finds true semantic neighbors.
    val clustered = (0L until 500L).map { i =>
      val c = (i % 100).toInt
      val r = (i / 100).toInt
      (i, Array.tabulate(64)(d =>
        (math.sin((c + 1.0) * (d + 1.0) * (d + 3.0) * 104729.0) +
          0.03 * math.sin(r * 997.0 + d)).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    val kC = 4
    val exactC = Similarity.bruteTopK(clustered, nQueries = nQ, k = kC)
      .cache()
    def recallC(approx: org.apache.spark.sql.DataFrame): Double =
      Similarity.meanRecall(approx, exactC)
    val ivf = recallC(Similarity.ivfTopK(clustered, nQueries = nQ, k = kC,
      nprobe = 2, nCells = 8))
    val pqR = recallC(Similarity.pqTopK(clustered, nQueries = nQ, k = kC,
      trainIters = 2, rerank = 50))
    val ivfpqR = recallC(Similarity.ivfPqTopK(clustered, nQueries = nQ,
      k = kC, nprobe = 2, rerank = 50))
    info(f"clustered recall@$kC: ivf=$ivf%.3f pqR=$pqR%.3f ivfpqR=$ivfpqR%.3f")
    assert(ivf >= 0.90, f"IVF must find cluster twins: $ivf%.3f")
    assert(pqR >= 0.90, f"trained PQ + rerank must find cluster twins: $pqR%.3f")
    assert(ivfpqR >= 0.90, f"IVF-PQ + rerank must find cluster twins: $ivfpqR%.3f")
  }
}
