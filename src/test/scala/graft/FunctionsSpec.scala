package graft

import org.apache.spark.sql.functions.col
import graft.functions.Functions._

/** Unit tests for the scalar kit, table-driven from strings observed in the
  * reference's headers/views (template:450-471,
  * create-athena-views-lambda.py:84-160). */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(in: String, c: org.apache.spark.sql.Column): Any =
    Seq(in).toDF("v").select(c.as("r")).collect().head.get(0)

  test("parseMoney strips leading $, stray $, trailing spaces") {
    assert(one("$55.30", parseMoney(col("v"))).toString == "55.30")
    assert(one("$1234.56 ", parseMoney(col("v"))).toString == "1234.56")
    // substr(.,2) drops the first char even if it isn't '$' — fidelity
    assert(one("$$12.00", parseMoney(col("v"))).toString == "12.00")
  }

  test("parseMoneyRds deletes $ and double-quotes, no substr") {
    assert(one("\"$42.50\"", parseMoneyRds(col("v"))).toString == "42.50")
  }

  test("parseDateTime drops sub-second suffix") {
    assert(one("2024-01-15 09:30:01.123456", parseDateTime(col("v")))
      .toString == "2024-01-15 09:30:01.0")
  }

  test("parseDateTimeIso handles 'T' separator (expiration date)") {
    assert(one("2024-06-30T23:59:59Z", parseDateTimeIso(col("v")))
      .toString == "2024-06-30 23:59:59.0")
  }

  test("maskAccountId keeps 2nd digit + last 4, embedded match") {
    assert(one("123456789012", maskAccountId(col("v"))) == "2XXXXXXX9012")
    assert(one("acct 999988887777 end", maskAccountId(col("v")))
      == "acct 9XXXXXXX7777 end")
    // 11 digits: no match, unchanged
    assert(one("12345678901", maskAccountId(col("v"))) == "12345678901")
  }

  test("maskNameEmail keeps 3-char prefix/suffix") {
    assert(one("Alice Corp", maskNameEmail(col("v"))) == "Ali-MASKED-orp")
    assert(one("ops@example.com", maskNameEmail(col("v"))) == "ops-MASKED-com")
  }

  test("arnResourceId: slash form, colon fallback, no-match empty") {
    assert(one("arn:aws:ec2:us-east-1:123:instance/i-0abc",
      arnResourceId(col("v"))) == "i-0abc")
    assert(one("arn:aws:redshift:us-east-1:123:cluster-x",
      arnResourceId(col("v"))) == "cluster-x")
    assert(one("no-separators", arnResourceId(col("v"))) == "")
  }

  test("stripCommas preserves null") {
    assert(one("1,234,567", stripCommas(col("v"))) == "1234567")
    val r = Seq[String](null).toDF("v")
      .select(stripCommas(col("v"))).collect().head
    assert(r.isNullAt(0))
  }

  test("Md5Long60 equals the conv(substring(md5)) chain on random strings") {
    import org.apache.spark.sql.functions.{conv, md5, substring}
    import org.apache.spark.sql.types.LongType
    val rnd = new scala.util.Random(42)
    val inputs = (0 until 200).map(_ =>
      rnd.alphanumeric.take(rnd.nextInt(30) + 1).mkString) ++
      Seq("", " ", "the quick", "0", "ünïcödé £§")
    val df = inputs.toDF("v").select(col("v"),
      graft.functions.Md5Long60(col("v")).as("native"),
      conv(substring(md5(col("v")), 1, 15), 16, 10).cast(LongType)
        .as("chain"))
    df.collect().foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"mismatch for '${r.getString(0)}'")
      assert(r.getLong(1) >= 0L)
    }
  }

  test("all three native expressions compile inside whole-stage codegen") {
    // forbid the silent interpreted fallback: a janino compile error in
    // either expression's generated code must FAIL here, not quietly
    // split the codegen span on the dedup family's hottest path
    import org.apache.spark.sql.functions.{concat, lit, sum, array}
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val h = spark.range(100)
        .select((graft.functions.Md5Long60(
          concat(lit("x"), col("id").cast("string"))) % 1000003L).as("h"))
        .agg(sum(col("h"))).head.getLong(0)
      assert(h > 0L)
      val d = spark.range(100)
        .select(graft.functions.LongArrayDot(
          array(col("id"), lit(2L)), array(lit(3L), col("id"))).as("d"))
        .agg(sum(col("d"))).head.getLong(0)
      assert(d == (0 until 100).map(i => i * 3L + 2L * i).sum)
      val sh = spark.range(100)
        .select(graft.functions.WordShingles(
          concat(lit("a b c d"), col("id").cast("string")), 2).as("sh"))
        .selectExpr("sum(size(sh)) AS s").head.getLong(0)
      assert(sh == 300L)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("zeroGuardFidelity replaces every '0' digit (the reference bug)") {
    assert(one("0", zeroGuardFidelity(col("v"))) == "1")
    assert(one("105", zeroGuardFidelity(col("v"))) == "115")
    assert(one("100", zeroGuardFidelity(col("v"))) == "111")
  }
}
