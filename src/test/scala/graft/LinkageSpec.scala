package graft

import org.apache.spark.sql.functions._
import graft.ops.Linkage

class LinkageSpec extends SparkSpec {

  private def ent(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("key", "name")
      .withColumn("block", split(col("name"), " ").getItem(0))
  }

  test("fuzzyResolve picks the closest candidate, ties to smaller key") {
    val left = ent(Seq((1L, "red widget"), (2L, "blue bolt")))
    val right = ent(Seq(
      (10L, "red widgex"),  // dist 1 to "red widget"
      (11L, "red widget"),  // dist 0 — must win
      (12L, "red widget"),  // dist 0 tie — larger key loses
      (20L, "green gear"))) // different block
    val m = Linkage.fuzzyResolve(left, right, maxDist = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(m === Map(1L -> ((11L, 0))))
    // "blue bolt" has no same-block candidate -> absent, not null-matched
  }

  test("fuzzyResolve drops over-cap blocks whole") {
    val left = ent(Seq((1L, "hot gear")))
    val right = ent((10L to 20L).map(k => (k, s"hot gear$k")))
    assert(Linkage.fuzzyResolve(left, right, maxDist = 3, blockCap = 5)
      .count() === 0L)
    assert(Linkage.fuzzyResolve(left, right, maxDist = 3, blockCap = 50)
      .count() === 1L)
  }

  test("entityResolution: transitive merge, canonical survival, totality") {
    import spark.implicits._
    // 1~2 and 2~3 at dist 1, but 1~3 at dist 2: the transitive
    // closure must still merge all three into entity 1; key 4 has no
    // match and stays its own entity
    val recs = Seq((1L, "aaa", "b1"), (2L, "aab", "b1"),
      (3L, "abb", "b1"), (4L, "zzz", "b2"))
      .toDF("key", "name", "block")
    val r = Linkage.entityResolution(recs, maxDist = 1).collect()
      .map(x => x.getLong(0) -> (x.getString(1), x.getLong(2),
        x.getBoolean(3), x.getString(4))).toMap
    assert(r.size == 4, s"output must be total: $r")
    for (k <- Seq(1L, 2L, 3L)) {
      assert(r(k)._2 == 1L, s"key $k entity: $r")
      assert(r(k)._4 == "aaa", s"key $k canonical name: $r")
    }
    assert(r(1L)._3 && !r(2L)._3 && !r(3L)._3)
    assert(r(4L) == ("zzz", 4L, true, "zzz"))
    graft.ops.TextKit.releaseCaches()
  }
}
