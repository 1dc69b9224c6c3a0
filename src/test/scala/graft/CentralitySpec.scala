package graft

import org.apache.spark.sql.functions._

import graft.ops.Centrality

/** Centrality semantics the q133 oracle can't see: the HUB of a star
  * must out-rank its spokes and win canonical even when it is NOT the
  * minimum id (the case where min-id canonical picks wrong), and
  * disjoint clusters elect independent canonicals. */
class CentralitySpec extends SparkSpec {

  import spark.implicits._

  // Star: hub 50 tied to spokes 1..6 (spokes only see the hub).
  // Chain: 100-101-102 (101 is the middle — most central).
  private lazy val pairs = (
    (1L to 6L).map(s => (math.min(s, 50L), math.max(s, 50L))) ++
    Seq((100L, 101L), (101L, 102L))
  ).toDF("doc_a", "doc_b")

  private lazy val out = Centrality.canonicalByRank(pairs)
    .collect()
    .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
    .toMap

  test("star hub out-ranks every spoke and wins canonical over min-id") {
    val (hubComp, hubPr, hubCanon) = out(50L)
    assert(hubComp == 1L) // component labeled by min id...
    assert(hubCanon, "hub must be canonical")
    (1L to 6L).foreach { s =>
      val (c, pr, canon) = out(s)
      assert(c == 1L && pr < hubPr && !canon)
    }
  }

  test("chain middle is canonical in its own component") {
    val (c0, pr0, k0) = out(100L)
    val (c1, pr1, k1) = out(101L)
    val (c2, pr2, k2) = out(102L)
    assert(Set(c0, c1, c2) == Set(100L))
    assert(k1 && !k0 && !k2)
    assert(pr1 > pr0 && pr1 > pr2 && pr0 == pr2)
  }

  test("every component elects exactly one canonical") {
    val byComp = out.values.groupBy(_._1)
    byComp.foreach { case (comp, members) =>
      assert(members.count(_._3) == 1, s"component $comp canonical count")
    }
  }

  test("kCore: pendant chains peel away, cycles survive with in-core degree") {
    // triangle 1-2-3 with pendant 3-4-5 chain, plus an isolated pair 8-9:
    // the 2-core is exactly the triangle (everyone at degree 2); the
    // chain peels in two rounds (5 first, then 4), the pair in one
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (8L, 9L)).toDF("doc_a", "doc_b")
    val core = graft.ops.Components.kCore(g, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"core=$core")
    // k=1 keeps everything (degree >= 1 is every endpoint): 7 nodes
    assert(graft.ops.Components.kCore(g, k = 1).count() == 7)
    // a star's 2-core is empty: spokes peel, then the hub
    val star = (1L to 5L).map(s => (s, 50L)).toDF("doc_a", "doc_b")
    assert(graft.ops.Components.kCore(star, k = 2).isEmpty)
  }

  test("labelPropagation: cliques converge to min id; communities refine components") {
    // two 4-cliques bridged by one edge: CC sees ONE component, LPA
    // separates the two dense families (each converges to its min id;
    // the single bridge edge can't outvote three clique neighbors)
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val g = (clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ (4L -> 10L))
      .toDF("doc_a", "doc_b")
    val lpa = graft.ops.Components.labelPropagation(g)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).map(lpa).distinct.size == 1)
    assert(Seq(10L, 11L, 12L, 13L).map(lpa).distinct.size == 1)
    assert(lpa(1L) != lpa(10L), s"bridge must not merge communities: $lpa")
    assert(graft.ops.Components.connectedComponents(g)
      .select("component_id").distinct().count() == 1)
    // determinism: a rerun is bit-identical
    val again = graft.ops.Components.labelPropagation(g)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == lpa)
    graft.ops.TextKit.releaseCaches()
  }
}
