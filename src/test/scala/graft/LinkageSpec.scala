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
}
