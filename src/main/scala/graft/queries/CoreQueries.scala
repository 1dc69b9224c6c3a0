package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.Functions._

/** Core relational operator coverage (SURVEY.md §2) expressed over the
  * driver's testdata tables, each with a DuckDB oracle.
  *
  * Determinism rules (the driver hash-compares against DuckDB):
  *  - double sums go through decimal (exact, order-independent) and are
  *    surfaced as double — safe under distributed partial aggregation;
  *  - no decimal division (scale rules differ between engines): divisions
  *    are done in double, which is IEEE-deterministic for identical inputs;
  *  - `events.ts` surfaces as epoch nanoseconds via [[graft.Tables]]
  *    (which absorbs the lake's physical encoding); queries work in
  *    integer microseconds, `ts DIV 1000` == DuckDB `epoch_us(ts)`.
  */
object CoreQueries {
  type Q = (SparkSession, String) => DataFrame

  private val dec = DecimalType(25, 6)

  /** A1/A5 + exact-sum discipline: pricing summary a la TPC-H Q1.
    * Covers: groupBy/agg (A1), count (A5), filter pushdown (P2). */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-01").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        decSum(col("l_quantity")).cast(DoubleType).as("sum_qty"),
        decSum(col("l_extendedprice")).cast(DoubleType).as("sum_base_price"),
        (decSum(col("l_quantity")).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** A2: guarded optimization-percent ratio, fidelity zero guard
    * (string '0'->'1', replicating create-athena-views-lambda.py:147-148). */
  def q02RatioGuard(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    ev.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("processed"),
        count(when(col("value") > 150, 1)).as("flagged"),
        count(when(col("value") < 10, 1)).as("ignored"))
      .select(
        col("event_type"), col("processed"), col("flagged"), col("ignored"),
        ((lit(1.0) - col("flagged").cast(DoubleType) /
          zeroGuardFidelity(col("processed")).cast(DoubleType)) * 100)
          .as("optimization_percent"),
        ((lit(1.0) - (col("flagged") - col("ignored")).cast(DoubleType) /
          zeroGuardFidelity(col("processed")).cast(DoubleType)) * 100)
          .as("true_optimization_percent"))
      .orderBy("event_type")
  }

  /** A3: last-wins dedup by key at scale — window row_number, no driver-side
    * state (the reference's dict-overwrite at extract-tag-data-lambda.py:74-89). */
  def q03LastWinsDedup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .withColumn("ts_us", expr("ts DIV 1000"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("event_type"), col("value"))
      .orderBy("user_id")
  }

  /** A4: pivot — dynamic tag-column semantics
    * (extract-tag-data-lambda.py:76-79,129-133). */
  def q04Pivot(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val langs = Seq("en", "fr", "es", "de", "zh")
    val p = docs.groupBy(col("source")).pivot("lang", langs).agg(count(lit(1)))
    p.select(col("source") +: langs.map(l => coalesce(col(l), lit(0L)).as(l)): _*)
      .orderBy("source")
  }

  /** J1: conditional two-key LEFT equi-join — the reference's
    * check LEFT JOIN tags ON (resourceKey, datetime)
    * (create-athena-views-lambda.py:91-93). The small dim side is broadcast:
    * at 100 TB the fact side never shuffles. */
  def q05TwoKeyLeftJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .withColumn("ts_us", expr("ts DIV 1000"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    val dim = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ts_us"), col("props").as("tag_value"))
    ev.join(broadcast(dim), Seq("user_id", "ts_us"), "left")
      .select(col("user_id"), col("event_id"), col("ts_us"), col("tag_value"))
      .orderBy("user_id", "event_id")
  }

  /** J3: cross product (resourceTypes x regions fan-out,
    * get-tags-lambda.py:66-87). */
  def q06CrossJoin(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables(spark, dir, "region")
    val n = Tables(spark, dir, "nation")
    r.crossJoin(n).select(col("r_name"), col("n_name")).orderBy("r_name", "n_name")
  }

  /** J4: ARN -> ResourceId regex fallback chain
    * (extract-tag-data-lambda.py:48-57); both `/` and `:` branches. */
  def q07ArnExtract(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables(spark, dir, "supplier")
    val arn1 = concat(lit("arn:aws:ec2:us-east-1:123456789012:instance/i-"),
      col("s_suppkey"))
    val arn2 = concat(lit("arn:aws:redshift:us-east-1:123456789012:cluster-"),
      col("s_suppkey"))
    s.select(col("s_suppkey"),
        arnResourceId(arn1).as("resource_id_slash"),
        arnResourceId(arn2).as("resource_id_colon"))
      .orderBy("s_suppkey")
  }

  /** P1: schema-token projection — positional metadata-array indexing
    * (extract-ta-data-lambda.py:169-177) over the embeddings array column. */
  def q08SchemaProjection(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "embeddings")
    e.select(col("vec_id"),
        element_at(col("embedding"), 1).as("dim0"),
        element_at(col("embedding"), 32).as("dim31"),
        element_at(col("embedding"), 64).as("dim63"),
        col("label"))
      .orderBy("vec_id")
  }

  /** P2: status filter (warning/error isin — extract-ta-data-lambda.py:165). */
  def q09StatusFilter(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    ev.filter(col("event_type").isin("error", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy("event_id")
  }

  /** P3/P4: null-preserving comma/quote strip (extract-ta-data-lambda.py:170-175). */
  def q10StripChars(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    ev.select(col("event_id"),
        stripCommas(deleteAll(col("props"), "\"")).as("props_clean"))
      .orderBy("event_id")
  }

  /** P5: prefix/append standard columns (Date/DateTime/CheckName +
    * Account triple, extract-ta-data-lambda.py:128-131,159-162). */
  def q11PrefixSuffix(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables(spark, dir, "nation")
    n.select(
        lit("01-15-2024").as("date"),
        lit("2024-01-15 09:00:00").as("datetime"),
        lit("Low Utilization Amazon EC2 Instances").as("checkname"),
        col("n_nationkey"), col("n_name"),
        lit("123456789012").as("accountid"),
        lit("graft-account").as("accountname"),
        lit("ops@example.com").as("accountemail"))
      .orderBy("n_nationkey")
  }

  /** P6/P7: active-account + category/allowlist filters
    * (get-accounts-info-lambda.py:114, get-ta-checks-lambda.py:64-66). */
  def q12Allowlist(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    c.filter(col("c_mktsegment") === "BUILDING" &&
        col("c_nationkey").isin(1, 2, 3, 7, 11))
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .orderBy("c_custkey")
  }

  /** P12: PII masks — 12-digit account-id regex with positional
    * reconstruction + name/email 3-char mask (extract-ta-data-lambda.py:29-54). */
  def q13MaskPii(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val acct = lpad(col("c_custkey").cast(StringType), 12, "4")
    c.select(col("c_custkey"),
        maskAccountId(concat(lit("account="), acct, lit(" ok"))).as("masked_id"),
        maskNameEmail(col("c_name")).as("masked_name"))
      .orderBy("c_custkey")
  }

  /** Money parse: `$`-strip + comma-strip + rtrim + decimal cast
    * (create-athena-views-lambda.py:90 and ingest comma-strip :175). */
  def q14MoneyParse(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val asDec = col("o_totalprice").cast(DecimalType(12, 2)).cast(StringType)
    val money = concat(lit("$"),
      regexp_replace(asDec, "(\\d)(\\d{3}\\.)", "$1,$2"), lit(" "))
    // Surfaced as DOUBLE per the determinism rules above: raw DecimalType at
    // the boundary hashes differently between Spark parquet and DuckDB.
    o.select(col("o_orderkey"),
        parseMoney(stripCommas(money)).cast(DoubleType).as("parsed_savings"))
      .orderBy("o_orderkey")
  }

  /** date_parse(substr(x,1,19),'%Y-%m-%d %T') round-trip
    * (create-athena-views-lambda.py:87). */
  def q15DateParse(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val s = date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss.SSS")
    o.select(col("o_orderkey"), parseDateTime(s).as("date_time"))
      .orderBy("o_orderkey")
  }

  /** A1 native summary re-derivation: per (check=event_type, day) counts +
    * exact savings + native-guard ratio — the summary_view pipeline
    * (extract-ta-data-lambda.py:127-155 + create-athena-views-lambda.py:144-149). */
  def q16Summary(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    ev.groupBy(col("event_type").as("checkname"),
        to_date(timestamp_micros(expr("ts DIV 1000"))).as("date"))
      .agg(
        count(lit(1)).as("resourcesprocessed"),
        count(when(col("value") > 100, 1)).as("resourcesflagged"),
        count(when(col("value") < 5, 1)).as("resourcesignored"),
        decSum(when(col("value") > 100, col("value")))
          .cast(DoubleType).as("estimatedmonthlysavings"))
      .select(col("checkname"), col("date"), col("resourcesprocessed"),
        col("resourcesflagged"), col("resourcesignored"),
        col("estimatedmonthlysavings"),
        ((lit(1.0) - col("resourcesflagged").cast(DoubleType) /
          zeroGuardNative(col("resourcesprocessed")).cast(DoubleType)) * 100)
          .as("optimizationpercent"))
      .orderBy("checkname", "date")
  }

  /** Window extension (SURVEY §2.5): 14-row trailing average per user —
    * native re-derivation of the check's pre-computed 14-day CPU average. */
  def q17TrailingAvg(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(expr("ts DIV 1000"), col("event_id")).rowsBetween(-13, 0)
    ev.select(col("user_id"), col("event_id"),
        (sum(col("value").cast(dec)).over(w).cast(DoubleType) /
          count(lit(1)).over(w)).as("avg14"))
      .orderBy("user_id", "event_id")
  }

  /** Sort + limit (free from Spark SQL; SURVEY §2.7): top-25 orders. */
  def q18TopK(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    o.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .limit(25)
  }

  /** Multi-table join + agg: revenue per nation (join chain with broadcast
    * dims — the J1 pattern generalized; exercises shuffle-side agg). */
  def q19JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    val n = Tables(spark, dir, "nation")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /** Set op (SURVEY §2.7 — free from Spark): customers in segment A union
    * suppliers' nation keys, distinct. */
  def q20SetOps(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val s = Tables(spark, dir, "supplier")
    c.filter(col("c_mktsegment") === "MACHINERY")
      .select(col("c_nationkey").cast(LongType).as("nationkey"))
      .union(s.select(col("s_nationkey").cast(LongType)))
      .distinct()
      .orderBy("nationkey")
  }

  /** Grouping sets (SURVEY §2.7 family — free from Spark): ROLLUP over
    * (returnflag, linestatus) with the grouping-id bitmask disambiguating
    * subtotal rows from genuine NULL groups. One hash aggregation
    * computes all three levels (Spark expands grouping sets into a
    * single multi-key aggregate — no per-level rescans), so at 100 TB
    * the cube costs one shuffle like any groupBy. Null ordering is
    * pinned NULLS FIRST on both engines. */
  def q156Rollup(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(decSum(col("l_quantity")).cast(DoubleType).as("sum_qty"),
        count(lit(1)).as("n"), grouping_id().as("gid"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  /** Unpivot (§2.5's pivot inverted): measure columns melt to
    * (measure, value) rows via stack — row-local, no shuffle beyond the
    * output sort; the schema-normalization step long-format pipelines
    * start from. */
  def q191Unpivot(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "lineitem")
      .filter(col("l_orderkey") % 50 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("stack(3, 'quantity', l_quantity, 'extendedprice', " +
          "l_extendedprice, 'discount', l_discount) AS (measure, value)"))
      .orderBy("l_orderkey", "l_linenumber", "measure")
  }

  /** INTERSECT / EXCEPT (§2.7 completed beyond q20's union): nations
    * having customers in the MACHINERY segment vs nations having
    * suppliers — both set ops in one labeled union. */
  def q192SetDiff(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
      .filter(col("c_mktsegment") === "MACHINERY")
      .select(col("c_nationkey").cast(LongType).as("nationkey"))
    val s = Tables(spark, dir, "supplier")
      .select(col("s_nationkey").cast(LongType).as("nationkey"))
    c.intersect(s).withColumn("op", lit("intersect"))
      .unionByName(c.except(s).withColumn("op", lit("except")))
      .orderBy("op", "nationkey")
  }

  val queries: Map[String, Q] = Map(
    "q191_unpivot" -> (q191Unpivot _),
    "q192_set_diff" -> (q192SetDiff _),
    "q156_rollup" -> (q156Rollup _),
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_ratio_guard" -> (q02RatioGuard _),
    "q03_lastwins_dedup" -> (q03LastWinsDedup _),
    "q04_pivot" -> (q04Pivot _),
    "q05_twokey_left_join" -> (q05TwoKeyLeftJoin _),
    "q06_cross_join" -> (q06CrossJoin _),
    "q07_arn_extract" -> (q07ArnExtract _),
    "q08_schema_projection" -> (q08SchemaProjection _),
    "q09_status_filter" -> (q09StatusFilter _),
    "q10_strip_chars" -> (q10StripChars _),
    "q11_prefix_suffix" -> (q11PrefixSuffix _),
    "q12_allowlist_filter" -> (q12Allowlist _),
    "q13_mask_pii" -> (q13MaskPii _),
    "q14_money_parse" -> (q14MoneyParse _),
    "q15_date_parse" -> (q15DateParse _),
    "q16_summary" -> (q16Summary _),
    "q17_trailing_avg" -> (q17TrailingAvg _),
    "q18_topk" -> (q18TopK _),
    "q19_join_agg" -> (q19JoinAgg _),
    "q20_set_ops" -> (q20SetOps _))

  val oracles: Map[String, String] = Map(
    "q191_unpivot" ->
      """WITH li AS (SELECT * FROM lineitem WHERE l_orderkey % 50 = 0)
         SELECT l_orderkey, l_linenumber, measure, value FROM (
           SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
             l_quantity AS value FROM li
           UNION ALL SELECT l_orderkey, l_linenumber, 'extendedprice',
             l_extendedprice FROM li
           UNION ALL SELECT l_orderkey, l_linenumber, 'discount',
             l_discount FROM li)
         ORDER BY l_orderkey, l_linenumber, measure""",
    "q192_set_diff" ->
      """WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nationkey
           FROM customer WHERE c_mktsegment = 'MACHINERY'),
         s AS (SELECT CAST(s_nationkey AS BIGINT) AS nationkey
           FROM supplier)
         SELECT nationkey, 'intersect' AS op FROM
           (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
         UNION ALL
         SELECT nationkey, 'except' FROM
           (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
         ORDER BY op, nationkey""",
    "q156_rollup" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
         count(*) AS n,
         GROUPING(l_returnflag, l_linestatus) AS gid
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS avg_qty,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q02_ratio_guard" ->
      """SELECT event_type, count(*) AS processed,
         count(*) FILTER (WHERE value > 150) AS flagged,
         count(*) FILTER (WHERE value < 10) AS ignored,
         (1.0 - CAST(count(*) FILTER (WHERE value > 150) AS DOUBLE) /
           CAST(replace(CAST(count(*) AS VARCHAR),'0','1') AS DOUBLE)) * 100
           AS optimization_percent,
         (1.0 - CAST(count(*) FILTER (WHERE value > 150) - count(*) FILTER (WHERE value < 10) AS DOUBLE) /
           CAST(replace(CAST(count(*) AS VARCHAR),'0','1') AS DOUBLE)) * 100
           AS true_optimization_percent
         FROM events GROUP BY 1 ORDER BY 1""",
    "q03_lastwins_dedup" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn FROM events)
         WHERE rn = 1 ORDER BY user_id""",
    "q04_pivot" ->
      """SELECT source,
         count(*) FILTER (WHERE lang='en') AS en,
         count(*) FILTER (WHERE lang='fr') AS fr,
         count(*) FILTER (WHERE lang='es') AS es,
         count(*) FILTER (WHERE lang='de') AS de,
         count(*) FILTER (WHERE lang='zh') AS zh
         FROM documents GROUP BY source ORDER BY source""",
    "q05_twokey_left_join" ->
      """SELECT e.user_id, e.event_id, epoch_us(e.ts) AS ts_us, d.tag_value
         FROM events e LEFT JOIN (
           SELECT user_id, epoch_us(ts) AS ts_us, props AS tag_value
           FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn FROM events)
           WHERE rn = 1) d
         ON e.user_id = d.user_id AND epoch_us(e.ts) = d.ts_us
         ORDER BY e.user_id, e.event_id""",
    "q06_cross_join" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY 1, 2",
    "q07_arn_extract" ->
      """SELECT s_suppkey,
         CASE WHEN contains(a1,'/') THEN regexp_extract(a1,'^.*/(.*)$',1)
              WHEN contains(a1,':') THEN regexp_extract(a1,'^.*:(.*)$',1)
              ELSE '' END AS resource_id_slash,
         CASE WHEN contains(a2,'/') THEN regexp_extract(a2,'^.*/(.*)$',1)
              WHEN contains(a2,':') THEN regexp_extract(a2,'^.*:(.*)$',1)
              ELSE '' END AS resource_id_colon
         FROM (SELECT s_suppkey,
           'arn:aws:ec2:us-east-1:123456789012:instance/i-' || s_suppkey AS a1,
           'arn:aws:redshift:us-east-1:123456789012:cluster-' || s_suppkey AS a2
           FROM supplier) ORDER BY s_suppkey""",
    "q08_schema_projection" ->
      """SELECT vec_id, embedding[1] AS dim0, embedding[32] AS dim31,
         embedding[64] AS dim63, label FROM embeddings ORDER BY vec_id""",
    "q09_status_filter" ->
      """SELECT event_id, user_id, event_type, value FROM events
         WHERE event_type IN ('error','purchase') ORDER BY event_id""",
    "q10_strip_chars" ->
      """SELECT event_id, replace(replace(props,'"',''),',','') AS props_clean
         FROM events ORDER BY event_id""",
    "q11_prefix_suffix" ->
      """SELECT '01-15-2024' AS date, '2024-01-15 09:00:00' AS datetime,
         'Low Utilization Amazon EC2 Instances' AS checkname,
         n_nationkey, n_name, '123456789012' AS accountid,
         'graft-account' AS accountname, 'ops@example.com' AS accountemail
         FROM nation ORDER BY n_nationkey""",
    "q12_allowlist_filter" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
         WHERE c_mktsegment = 'BUILDING' AND c_nationkey IN (1,2,3,7,11)
         ORDER BY c_custkey""",
    "q13_mask_pii" ->
      """SELECT c_custkey,
         regexp_replace('account=' || lpad(CAST(c_custkey AS VARCHAR),12,'4') || ' ok',
           '\d(\d)\d{6}(\d{4})', '\1XXXXXXX\2') AS masked_id,
         substr(c_name,1,3) || '-MASKED-' || right(c_name,3) AS masked_name
         FROM customer ORDER BY c_custkey""",
    "q14_money_parse" ->
      """SELECT o_orderkey,
         CAST(CAST(rtrim(replace(replace(substr(m,2),'$',''),',','')) AS DECIMAL(18,2)) AS DOUBLE)
           AS parsed_savings
         FROM (SELECT o_orderkey,
           '$' || regexp_replace(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR),
             '(\d)(\d{3}\.)', '\1,\2') || ' ' AS m
           FROM orders) ORDER BY o_orderkey""",
    "q15_date_parse" ->
      """SELECT o_orderkey,
         strptime(substr(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S.%g'),1,19),
           '%Y-%m-%d %H:%M:%S') AS date_time
         FROM orders ORDER BY o_orderkey""",
    "q16_summary" ->
      """SELECT event_type AS checkname, CAST(ts AS DATE) AS date,
         count(*) AS resourcesprocessed,
         count(*) FILTER (WHERE value > 100) AS resourcesflagged,
         count(*) FILTER (WHERE value < 5) AS resourcesignored,
         CAST(sum(CAST(value AS DECIMAL(25,6))) FILTER (WHERE value > 100) AS DOUBLE)
           AS estimatedmonthlysavings,
         (1.0 - CAST(count(*) FILTER (WHERE value > 100) AS DOUBLE) /
           CAST(CASE WHEN count(*) = 0 THEN 1 ELSE count(*) END AS DOUBLE)) * 100
           AS optimizationpercent
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q17_trailing_avg" ->
      """SELECT user_id, event_id,
         CAST(sum(CAST(value AS DECIMAL(25,6))) OVER w AS DOUBLE) /
           count(*) OVER w AS avg14
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, event_id""",
    "q18_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""",
    "q19_join_agg" ->
      """SELECT n_name,
         CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)
           AS revenue,
         count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1 ORDER BY 1""",
    "q20_set_ops" ->
      """SELECT DISTINCT nationkey FROM (
           SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
           WHERE c_mktsegment = 'MACHINERY'
           UNION ALL SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
         ORDER BY nationkey""")
}
