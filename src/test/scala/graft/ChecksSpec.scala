package graft

import graft.ops.Checks
import graft.ops.Checks._

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some(10.0), "F"), (2L, Some(20.0), "O"),
    (3L, None, "F"), (3L, Some(-5.0), "X"))
    .toDF("k", "v", "s")

  test("one-pass suite reports each constraint's metric and verdict") {
    val r = Checks.run(df, Seq(
        Complete("v"), Unique("k"), InRange("v", 0.0, 100.0),
        InSet("s", Seq("F", "O")), MinRows(10)))
      .collect().map(x => x.getString(0) -> (x.getDouble(1), x.getBoolean(2)))
      .toMap
    assert(r("complete(v)") === ((0.75, false)))
    assert(r("unique(k)")._2 === false) // 3 distinct of 4
    assert(r("in_range(v)") === ((1.0, false))) // one violation
    assert(r("in_set(s)") === ((1.0, false)))
    assert(r("min_rows") === ((4.0, false)))
  }

  test("gate passes a clean table and drives a WAP audit") {
    val clean = Seq((1L, 1.0, "F"), (2L, 2.0, "O")).toDF("k", "v", "s")
    val suite = Seq(Complete("v"), Unique("k"),
      InRange("v", 0.0, 10.0), InSet("s", Seq("F", "O")), MinRows(1))
    assert(Checks.gate(clean, suite))
    assert(!Checks.gate(df, suite))
  }
}
