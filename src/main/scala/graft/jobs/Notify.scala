package graft.jobs

/** K9 — the post-refresh notification sink. The reference wires an
  * EventBridge rule on the crawler's Succeeded state to (a) publish a
  * human-readable summary to an SNS topic and (b) trigger view creation
  * (template:3284-3339; the SNS topic is the stack's advertised output,
  * template:4105-4108). In the Spark re-expression, view creation is
  * already chained inside [[Pipeline.refreshCatalog]]; this closes the
  * notification half: a pluggable [[Notify.Notifier]] that receives one
  * [[Notify.CatalogRefreshEvent]] per successful refresh, rendered with
  * the same fields the reference's InputTransformer extracts
  * (completion date, tables created/updated/deleted, partitions, warning
  * message — template:3313-3323). The default sink logs; an AWS
  * deployment swaps in an `sns:Publish` implementation with the same
  * rendered body — the exact swap-point pattern [[graft.sources.TaFetchStub]]
  * uses for the Support API. */
object Notify {

  /** One successful catalog refresh, in the reference event's terms. */
  final case class CatalogRefreshEvent(
      completionDate: String,
      tablesCreated: Seq[String],
      tablesUpdated: Seq[String],
      tablesDeleted: Seq[String],
      partitionsSynced: Long,
      viewsCreated: Seq[String],
      warningMessage: String = "")

  trait Notifier {
    def publish(subject: String, body: String): Unit
  }

  /** Default sink: the driver log. */
  object Log extends Notifier {
    private val log = org.slf4j.LoggerFactory.getLogger(getClass)
    override def publish(subject: String, body: String): Unit =
      log.info(s"$subject\n$body")
  }

  /** No-op sink for callers that opt out. */
  object Silent extends Notifier {
    override def publish(subject: String, body: String): Unit = ()
  }

  /** Render the event as the reference's InputTemplate does
    * (template:3325): a one-line subject and a field-per-line body. */
  def render(e: CatalogRefreshEvent): (String, String) = {
    val subject =
      "Catalog refresh has successfully refreshed new Trusted Advisor Data"
    val body = Seq(
      "Event Details:-",
      s"completionDate: ${e.completionDate}",
      s"warningMessage: ${e.warningMessage}",
      s"tablesCreated: ${e.tablesCreated.mkString(",")}",
      s"tablesUpdated: ${e.tablesUpdated.mkString(",")}",
      s"tablesDeleted: ${e.tablesDeleted.mkString(",")}",
      s"partitionsSynced: ${e.partitionsSynced}",
      s"viewsCreated: ${e.viewsCreated.mkString(",")}").mkString("\n")
    (subject, body)
  }
}
