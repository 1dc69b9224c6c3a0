package graft.views

import org.apache.spark.sql.SparkSession

import graft.model.{CheckRegistry, CheckSpec}

/** Programmatic builder for the reference's 10 Athena views
  * (`source/create-athena-views-lambda.py:84-172`), emitted in Spark SQL
  * dialect against the session catalog.
  *
  * Faithful semantics, translated syntax only:
  *  - `date_parse(substr(x,1,19),'%Y-%m-%d %T')` ->
  *    `to_timestamp(substr(x,1,19),'yyyy-MM-dd HH:mm:ss')`
  *  - Presto 2-arg `replace(x,'$')` -> Spark `replace(x,'$','')`
  *  - `"quoted"."identifiers"` -> backticks
  *  - `%Insert_Tags_Here%` splice and the tags-table presence probe (J2)
  *    are reproduced as build-time conditionals: `spark.catalog.tableExists`
  *    replaces the Glue `get_table` call (create-athena-views-lambda.py:57-72).
  *
  * The optimizer note: the LEFT JOIN keeps the check table's rows intact, and
  * `tags` is small relative to check details, so Catalyst/AQE plans it as a
  * broadcast hash join — the fact side never shuffles.
  */
object Views {

  private def ts(t: String, c: String = "datetime"): String =
    s"to_timestamp(substr(`$t`.`$c`, 1, 19), 'yyyy-MM-dd HH:mm:ss')"

  /** `CAST(rtrim(replace(substr(x,2),'$')) AS decimal(18,2))` */
  private def money(t: String, c: String, alias: String): String =
    s"CAST(rtrim(replace(substr(`$t`.`$c`, 2), '$$', '')) AS decimal(18,2)) AS `$alias`"

  private def joinOrBare(t: String, key: String, tagged: Boolean): String =
    if (tagged)
      s"""FROM `$t` LEFT JOIN tags
         ON ((`$t`.`${key.toLowerCase}` = `tags`.`resourceid`)
         AND (`$t`.`datetime` = `tags`.`datetime`))"""
    else s"FROM `$t`"

  /** `, tags.`key` ...` — the %Insert_Tags_Here% fragment (P13). */
  private def tagCols(tagKeys: Seq[String], tagged: Boolean): String =
    if (!tagged) "" else tagKeys.map(k => s", `tags`.`${k.toLowerCase}`").mkString(" ")

  /** `CREATE OR REPLACE TEMPORARY VIEW` (session-scoped, default) vs the
    * reference's durable `CREATE OR REPLACE VIEW`
    * (create-athena-views-lambda.py:84-86 — Athena views persist in Glue). */
  private def createKw(temporary: Boolean): String =
    if (temporary) "CREATE OR REPLACE TEMPORARY VIEW"
    else "CREATE OR REPLACE VIEW"

  /** One view's SELECT body; `derived` are the extra projected columns. */
  private def view(name: String, t: String, derived: Seq[String],
      tagKeys: Seq[String], tagged: Boolean, joinKey: Option[String],
      temporary: Boolean): String = {
    // one producer for the FROM clause: a keyless view is just the
    // untagged branch of joinOrBare (no duplicated string to drift)
    val from = joinOrBare(t, joinKey.getOrElse(""),
      tagged && joinKey.isDefined)
    s"""${createKw(temporary)} $name AS
       SELECT `$t`.*, ${derived.mkString(", ")}
       ${tagCols(tagKeys, tagged && joinKey.isDefined)}
       $from"""
  }

  /** All 10 view definitions (9 check views + summary_view), keyed by view
    * name. `tagged` = the reference's `Tags != '' and status == 'PRESENT'`
    * gate (create-athena-views-lambda.py:93 etc.). */
  def definitions(tagKeys: Seq[String], tagged: Boolean,
      temporary: Boolean = true): Map[String, String] = {
    val tg = tagged && tagKeys.nonEmpty
    def checkView(spec: CheckSpec, derived: Seq[String]): (String, String) =
      spec.viewName -> view(spec.viewName, spec.tableName,
        derived, tagKeys, tg, spec.tagJoinKey, temporary)

    Map(
      // create-athena-views-lambda.py:84-93
      checkView(CheckRegistry.lowUtilEc2, Seq(
        s"${ts("check_qch7dwoux1")} AS `date_time`",
        "CAST(substr(`check_qch7dwoux1`.`14-day average cpu utilization`, 1, 3) AS decimal(10,4)) AS `average_cpu_utilization_14_days`",
        "CAST(substr(`check_qch7dwoux1`.`14-day average network i/o`, 1, 4) AS decimal(10,4)) AS `average_network_i/o_utilization_14 days`",
        money("check_qch7dwoux1", "estimated monthly savings", "estimated_monthly_savings"))),
      // :95-102
      checkView(CheckRegistry.underutilEbs, Seq(
        s"${ts("check_davu99dc4c")} AS `date_time`",
        money("check_davu99dc4c", "monthly storage cost", "Monthly_Storage_Cost"))),
      // :104-110
      checkView(CheckRegistry.idleLb, Seq(
        s"${ts("check_hjlmh88um8")} AS `date_time`",
        money("check_hjlmh88um8", "estimated monthly savings", "estimated_monthly_savings"))),
      // :112-119 — RDS: no substr, double delete of '$' and '"', decimal(10,2)
      checkView(CheckRegistry.idleRds, Seq(
        s"${ts("check_ti39halfu8")} AS `date_time`",
        "CAST(rtrim(replace(replace(`check_ti39halfu8`.`estimated monthly savings on demand`, '$', ''), '\"', '')) AS decimal(10,2)) AS `estimated_monthly_savings`")),
      // :121-126
      checkView(CheckRegistry.underutilRedshift, Seq(
        s"${ts("check_g31sq1e9u")} AS `date_time`")),
      // :128-134 — no tag join; extra ISO-'T' expiration-date parse
      checkView(CheckRegistry.riLeaseExpiration, Seq(
        s"${ts("check_1e93e4c0b5")} AS `date_time`",
        money("check_1e93e4c0b5", "current monthly cost", "current_monthly_cost"),
        money("check_1e93e4c0b5", "estimated monthly savings", "estimated_monthly_savings"),
        "to_timestamp(substr(replace(`expiration date`, 'T', ' '), 1, 19), 'yyyy-MM-dd HH:mm:ss') AS `expiration_date`")),
      // :136-142
      checkView(CheckRegistry.route53Latency, Seq(
        s"${ts("check_51fc20e7i2")} AS `date_time`")),
      // :151-152
      checkView(CheckRegistry.unassocEip, Seq(
        s"${ts("check_z4aubrnsmz")} AS `date_time`")),
      // :154-160 — defined but not submitted by the reference's checks list
      checkView(CheckRegistry.riOptimization, Seq(
        s"${ts("check_cx3c2r1chu")} AS `date_time`",
        money("check_cx3c2r1chu", "estimated savings with recommendation monthly", "estimated_savings_with_recommendation_monthly"),
        money("check_cx3c2r1chu", "upfront cost of ris", "upfront_cost_of_ris"),
        money("check_cx3c2r1chu", "estimated cost of ris monthly", "estimated_cost_of_ris_monthly"),
        money("check_cx3c2r1chu", "estimated on-demand cost post recommended ri purchase monthly", "estimated_on-demand_cost_post_recommended_ri_purchase_monthly"))),
      // :144-149 — summary_view with the string '0'->'1' zero guard, verbatim
      "summary_view" ->
        s"""${createKw(temporary)} summary_view AS
           SELECT summary.*, ${ts("summary")} AS `date_time`,
           ((1 - (CAST(`resourcesflagged` AS decimal(10,2)) /
             CAST(replace(CAST(`resourcesprocessed` AS string), '0', '1') AS decimal(10,2)))) * 100) AS `optimizationPercent`,
           ((1 - ((CAST(`resourcesflagged` AS decimal(10,2)) -
             (CAST(`resourcesignored` AS decimal(10,2)) + CAST(`resourcessuppressed` AS decimal(10,2)))) /
             CAST(replace(CAST(`resourcesprocessed` AS string), '0', '1') AS decimal(10,2)))) * 100) AS `trueoptimizationPercent`
           FROM summary""")
  }

  /** The 9 views the reference actually submits (its `checks` list at
    * create-athena-views-lambda.py:162 omits EC2ReservedInstancesOptimization). */
  val submittedViews: Seq[String] = Seq(
    "EC2ReservedInstanceLeaseExpiration_view",
    "Route53LatencyResourceRecordSets_view",
    "UnderutilizedAmazonEBSVolumes_view",
    "UnderutilizedAmazonRedshiftClusters_view",
    "LowUtilizationAmazonEC2Instances_view",
    "AmazonRDSIdleDBInstances_view",
    "UnassociatedElasticIPAddresses_view",
    "IdleLoadBalancers_view",
    "summary_view")

  /** Create the views whose base tables exist in the catalog. `tagged` is
    * decided like the reference: tag keys configured AND tags table present.
    * `temporary = false` persists the views in the catalog (the reference's
    * durable Athena views) — requires the base tables to be catalog tables,
    * not temp views (Lake.registerTables persistent mode). */
  def createAll(spark: SparkSession, tagKeys: Seq[String],
      onlySubmitted: Boolean = true, temporary: Boolean = true): Seq[String] = {
    // a persistent view may only reference catalog tables — a same-named
    // temp view left by an earlier ephemeral run does not count
    def usable(table: String): Boolean =
      spark.catalog.tableExists(table) &&
        (temporary || !spark.catalog.getTable(table).isTemporary)
    val tagged = tagKeys.nonEmpty && usable("tags")
    val defs = definitions(tagKeys, tagged, temporary)
    val names = if (onlySubmitted) submittedViews else defs.keys.toSeq
    names.filter { name =>
      usable(baseTable(name)) && { spark.sql(defs(name)); true }
    }
  }

  private def baseTable(viewName: String): String =
    if (viewName == "summary_view") "summary"
    else CheckRegistry.all.find(_.viewName == viewName).get.tableName
}
