package graft

import org.apache.spark.sql.types.{ArrayType, MapType}

/** Repo-wide convention (round 9, VERDICT r8 item 2): every
  * `SparkEntry.queries` output carries SCALAR top-level columns only.
  * The driver's DuckDB-oracle harness sorts result rows with pandas
  * `sort_values` over every column, and pandas cannot factorize an
  * array cell (`TypeError: unhashable type: 'numpy.ndarray'`) — so a
  * query with a top-level array/map column is a query whose oracle
  * comparison can never run (q137 was red for exactly this in r8).
  * Operators stay free to RETURN arrays (abtt, sketches, codes);
  * their `queries` registration must project to scalars — posexplode
  * to one row per element, or `concat_ws` — with the same projection
  * mirrored in the DuckDB twin. */
class QueryOutputAuditSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("no SparkEntry query output has a top-level array or map column") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val bad = q(spark, sf).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] => s"$name.${f.name}"
        }
        bad
    }
    assert(offenders.isEmpty,
      s"array/map columns in query outputs (unsortable by the oracle " +
        s"harness): ${offenders.mkString(", ")}")
  }

  test("every query has an oracle and every oracle has a query") {
    // a query without an oracle silently downgrades the driver's gate
    // to a rows-only check; an oracle without a query is dead SQL —
    // both are registration drift, both fail here
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries missing oracles: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles missing queries: ${(o -- q).toSeq.sorted}")
  }
}
