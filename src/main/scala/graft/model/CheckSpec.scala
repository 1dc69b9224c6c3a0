package graft.model

/** One token of the reference's extraction-mapping DSL
  * (`Schema_<checkId>` env vars, template:459-467; dispatch on
  * `key.isdigit()` at extract-ta-data-lambda.py:169-177): a digit token
  * indexes the flaggedResource's positional `metadata` string array, a name
  * token reads a top-level field of the flaggedResource object.
  */
sealed trait SchemaToken
final case class MetaIdx(i: Int) extends SchemaToken
final case class Field(name: String) extends SchemaToken

object SchemaToken {
  // ASCII digits only, non-empty: "" is vacuously all-digits under forall
  // (a doubled/trailing comma in a schema spec would crash deep inside
  // toInt), and Unicode digits pass isDigit but not toInt
  def parse(token: String): SchemaToken =
    if (token.nonEmpty && token.forall(c => c >= '0' && c <= '9'))
      MetaIdx(token.toInt)
    else Field(token)
  def parseList(csv: String): Seq[SchemaToken] =
    csv.split(",").map(t => parse(t.trim)).toSeq
}

/** Registry entry for one Trusted Advisor check: replaces the reference's
  * `Header_<checkId>` / `Schema_<checkId>` env-var pairs
  * (template:450-467) plus the check catalog metadata
  * (get-ta-checks-lambda.py:56-76). `tableName` is the Glue/Athena-lowercased
  * form (`check_<id>`.toLowerCase — create-athena-views-lambda.py:86).
  */
final case class CheckSpec(
    id: String,
    name: String,
    category: String,
    header: Seq[String],
    mapping: Seq[SchemaToken],
    /** check-table column joined to tags.resourceid in the view layer
      * (create-athena-views-lambda.py:91-142); None = no tag join. */
    tagJoinKey: Option[String]) {
  require(header.length == mapping.length,
    s"check $id: header(${header.length}) != mapping(${mapping.length})")
  def tableName: String = s"check_${id.toLowerCase}"
  def viewName: String = CheckRegistry.viewNames(id)
}

/** The 8 cost-optimizing checks (template:1496 SupportedChecks) + summary.
  * Headers/mappings transcribed verbatim from template:450-471.
  */
object CheckRegistry {
  private def spec(id: String, name: String, header: String, schema: String,
      tagKey: Option[String]): CheckSpec =
    CheckSpec(id, name, "cost_optimizing",
      header.split(",").map(_.trim).toSeq, SchemaToken.parseList(schema), tagKey)

  val lowUtilEc2: CheckSpec = spec("Qch7DwouX1",
    "Low Utilization Amazon EC2 Instances",
    "Status,Region,AZ,Instance Id,Instance Name,Instance Type,Estimated Monthly Savings,Day1,Day2,Day3,Day4,Day5,Day6,Day7,Day8,Day9,Day10,Day11,Day12,Day13,Day14 Latest Day,14-Day Average CPU Utilization,14-Day Average Network I/O,Number of Days Low Utilization",
    "status,region,0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16,17,18,19,20,21",
    Some("Instance Id"))

  val idleLb: CheckSpec = spec("hjLMh88uM8", "Idle Load Balancers",
    "Status,Region,Load Balancer Name,Reason,Estimated Monthly Savings",
    "status,0,1,2,3", Some("Load Balancer Name"))

  val underutilEbs: CheckSpec = spec("DAvU99Dc4C",
    "Underutilized Amazon EBS Volumes",
    "Status,Region,Volume Id,Volume Name,Volume Type,Volume Size,Monthly Storage Cost,Snapshot Id,Snapshot Name,Snapshot Age",
    "status,0,1,2,3,4,5,6,7,8", Some("Volume Id"))

  val unassocEip: CheckSpec = spec("Z4AUBRNSmz",
    "Unassociated Elastic IP Addresses",
    "Status,Region,IP Address", "status,0,1", None)

  val idleRds: CheckSpec = spec("Ti39halfu8", "Amazon RDS Idle DB Instances",
    "Status,Region,DB Instance Name,Multi-AZ,Instance Type,Storage Provisioned GB,Days Since Last Connection,Estimated Monthly Savings On Demand",
    "status,0,1,2,3,4,5,6", Some("DB Instance Name"))

  val route53Latency: CheckSpec = spec("51fC20e7I2",
    "Amazon Route 53 Latency Resource Record Sets",
    "Status,Hosted Zone Name,Hosted Zone Id,Resource Record Set Name,Resource Record Set Type",
    "status,0,1,2,3", Some("Hosted Zone Name"))

  val underutilRedshift: CheckSpec = spec("G31sQ1E9U",
    "Underutilized Amazon Redshift Clusters",
    "Status,Region,Cluster,Instance Type,Reason,Estimated Monthly Savings",
    "0,1,2,3,4,5", Some("Cluster"))

  val riLeaseExpiration: CheckSpec = spec("1e93e4c0b5",
    "Amazon EC2 Reserved Instance Lease Expiration",
    "Status,Zone,Instance Type,Platform,Instance Count,Current Monthly Cost,Estimated Monthly Savings,Expiration Date,Reserved Instance Id,Reason",
    "0,1,2,3,4,5,6,7,8,9", None)

  val riOptimization: CheckSpec = spec("cX3c2R1chu",
    "Amazon EC2 Reserved Instances Optimization",
    "Status,Region,Instance Type,Platform,Recommended Number of RIs to Purchase,Expected Average RI Utilization,Estimated Savings with Recommendation Monthly,Upfront Cost of RIs,Estimated cost of RIs Monthly,Estimated On-Demand Cost Post Recommended RI Purchase Monthly,Estimated Break Even Months,Lookback Period Days,Term Years",
    "status,0,1,2,3,4,5,6,7,8,9,10,11", None)

  /** template:1496 — the allowlist actually fanned out per account. */
  val supported: Seq[CheckSpec] = Seq(lowUtilEc2, idleLb, underutilEbs,
    unassocEip, idleRds, route53Latency, underutilRedshift, riLeaseExpiration)

  /** All checks with view definitions (riOptimization has a view but is not
    * in SupportedChecks — create-athena-views-lambda.py defines
    * Query_cx3c2r1chu but omits it from the submitted `checks` list). */
  val all: Seq[CheckSpec] = supported :+ riOptimization

  val byId: Map[String, CheckSpec] = all.map(s => s.id -> s).toMap

  /** View names per create-athena-views-lambda.py:84-160. */
  val viewNames: Map[String, String] = Map(
    "Qch7DwouX1" -> "LowUtilizationAmazonEC2Instances_view",
    "DAvU99Dc4C" -> "UnderutilizedAmazonEBSVolumes_view",
    "hjLMh88uM8" -> "IdleLoadBalancers_view",
    "Ti39halfu8" -> "AmazonRDSIdleDBInstances_view",
    "G31sQ1E9U" -> "UnderutilizedAmazonRedshiftClusters_view",
    "1e93e4c0b5" -> "EC2ReservedInstanceLeaseExpiration_view",
    "51fC20e7I2" -> "Route53LatencyResourceRecordSets_view",
    "Z4AUBRNSmz" -> "UnassociatedElasticIPAddresses_view",
    "cX3c2R1chu" -> "EC2ReservedInstancesOptimization_view")

  /** Header_Summary (template:471). */
  val summaryHeader: Seq[String] = Seq("CheckId", "Status",
    "ResourcesProcessed", "ResourcesFlagged", "ResourcesIgnored",
    "ResourcesSuppressed", "EstimatedMonthlySavings",
    "EstimatedPercentMonthlySavings")

  /** Standard row prefix/suffix added at ingest
    * (extract-ta-data-lambda.py:128-131,159-162,178-181). */
  val prefixCols: Seq[String] = Seq("Date", "DateTime", "CheckName")
  val suffixCols: Seq[String] = Seq("AccountId", "AccountName", "AccountEmail")

  /** Fixed tag-table columns (extract-tag-data-lambda.py:129-130); tag keys
    * are appended dynamically. */
  val tagFixedCols: Seq[String] = Seq("Date", "DateTime", "AccountId",
    "AccountName", "AccountEmail", "RegionName", "ResourceType",
    "ResourceArn", "ResourceId")
}

/** Account driver-table row (get-accounts-info-lambda.py:104-170). */
final case class Account(
    AccountId: String, AccountName: String, AccountEmail: String,
    Status: String = "ACTIVE")
