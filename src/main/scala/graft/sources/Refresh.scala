package graft.sources

/** P9/P10 — the reference's refresh → poll-until-fresh control loop,
  * re-expressed as a driver-side utility that gates extraction.
  *
  * Reference shape (deployment/aws-trusted-advisor-explorer.template:
  * 1247-1304): per (account, check), the state machine runs
  * TARefresh → VerifyTACheckStatus → Choice; a status of `enqueued` or
  * `processing` loops through wait_X_seconds (SecondsPath
  * `$.WaitTimeInSec`, set by the PREVIOUS verify) back into verify;
  * anything else (success/none/abandoned) falls through to extraction.
  * The verify lambda (verify-ta-check-status-lambda.py:78-84) computes
  * `WaitTimeInSec = round(millisUntilNextRefreshable/1000)` and SKIPS
  * the wait (0) when that exceeds one hour.
  *
  * In the Spark re-expression this is a DRIVER concern: freshness is an
  * API-side property, so the loop runs before the DSv2 scan is planned
  * — one poll loop per (account, check) pair, then the extraction job
  * reads results exactly as before. The API calls are behind
  * [[Refresh.Api]] (stubbed in-sandbox by [[TaRefreshStub]], swapped for
  * assume-role + Support-API calls in a real deployment) and wrapped in
  * the same [[Retry.withTemplateRetry]] budgets the template grants the
  * two Task states (template:1218-1236).
  *
  * One deliberate deviation, pinned by spec: the reference's Choice
  * loop has NO iteration bound (a stuck `processing` check would spin
  * until the Step Functions execution timeout); here `maxPolls` bounds
  * the loop explicitly and the outcome records the last status, so a
  * stuck check degrades to "extract whatever the API has" — the same
  * place the reference's timeout lands, without the hang.
  */
object Refresh {

  /** One `describe_trusted_advisor_check_refresh_statuses` response
    * slice (verify-ta-check-status-lambda.py:46-51). */
  final case class PollStatus(status: String, millisUntilNextRefreshable: Long)

  /** The two Support-API calls the loop drives. Implementations must be
    * thread-safe: pairs are polled concurrently at fan-out. */
  trait Api {
    /** `refresh_trusted_advisor_check` → its status (P9,
      * refresh-ta-check-lambda.py:44-49). */
    def refreshCheck(accountId: String, checkId: String): String
    /** `describe_trusted_advisor_check_refresh_statuses` → status +
      * millis-until-next-refreshable (P10). */
    def pollStatus(accountId: String, checkId: String): PollStatus
  }

  /** verify-ta-check-status-lambda.py:78-84: `round(millis/1000)`, and a
    * wait above 3600 s is skipped (0). Python 3's `round` is
    * round-half-even — `math.rint` mirrors it exactly (500 ms → 0,
    * 1500 ms → 2, 2500 ms → 2). */
  def waitTimeInSec(millisUntilNextRefreshable: Long): Long = {
    val rounded = math.rint(millisUntilNextRefreshable / 1000.0).toLong
    if (rounded <= 3600) rounded else 0L
  }

  /** The Choice state (template:1286-1300): only `enqueued` and
    * `processing` re-enter the wait → verify loop; every other status
    * falls through to extraction (Default → TACheck). */
  def pollAgain(status: String): Boolean =
    status == "enqueued" || status == "processing"

  /** Result of one pair's loop: the refresh call's immediate status, the
    * status that released the loop (or the last one seen if `maxPolls`
    * ran out), the verify-call count, and each computed wait. */
  final case class Outcome(accountId: String, checkId: String,
      refreshStatus: String, finalStatus: String, polls: Int,
      waitsSec: Seq[Long]) {
    def exhausted: Boolean = pollAgain(finalStatus)
  }

  /** Run the full TARefresh → verify/wait loop for one (account, check).
    * `sleep` takes SECONDS (the state machine waits in seconds);
    * `retrySleep` is the millisecond sleeper for the retry budgets —
    * both injectable for tests. */
  def refreshAndAwait(api: Api, accountId: String, checkId: String,
      maxPolls: Int = 60, sleep: Long => Unit = s => Thread.sleep(s * 1000),
      retrySleep: Long => Unit = Thread.sleep): Outcome = {
    val refreshStatus = Retry.withTemplateRetry(retrySleep)(
      api.refreshCheck(accountId, checkId))
    var st = Retry.withTemplateRetry(retrySleep)(
      api.pollStatus(accountId, checkId))
    var polls = 1
    var waits = List.empty[Long]
    while (pollAgain(st.status) && polls < maxPolls) {
      val w = waitTimeInSec(st.millisUntilNextRefreshable)
      waits ::= w
      if (w > 0) sleep(w)
      st = Retry.withTemplateRetry(retrySleep)(
        api.pollStatus(accountId, checkId))
      polls += 1
    }
    Outcome(accountId, checkId, refreshStatus, st.status, polls, waits.reverse)
  }

  /** The Map state's fan-out (template:1210-1214): every (account,
    * check) pair runs its own refresh loop. Pairs are independent, so
    * they poll on a bounded thread pool — the driver-side equivalent of
    * the state machine's parallel Map iterations. */
  def awaitAll(api: Api, pairs: Seq[(String, String)], maxPolls: Int = 60,
      sleep: Long => Unit = s => Thread.sleep(s * 1000),
      retrySleep: Long => Unit = Thread.sleep,
      parallelism: Int = 8): Seq[Outcome] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, pairs.size max 1)))
    try {
      import scala.jdk.CollectionConverters._
      val tasks = pairs.map { case (a, c) =>
        new java.util.concurrent.Callable[Outcome] {
          override def call(): Outcome =
            refreshAndAwait(api, a, c, maxPolls, sleep, retrySleep)
        }
      }
      pool.invokeAll(tasks.asJava).asScala.toSeq.map(_.get())
    } finally pool.shutdown()
  }
}

/** STUB for the refresh/verify Support-API pair — deterministic synthetic
  * statuses keyed by (account, check), mirroring [[TaFetchStub]]'s role
  * for the result fetch. A real deployment swaps this for assume-role +
  * `refresh_trusted_advisor_check` / `describe_..._refresh_statuses`
  * calls; the loop, retry budgets, and wait math stay identical.
  *
  * Behavior: each pair starts `enqueued`, spends `seed % 3` further polls
  * `processing`, then lands `success`; `millisUntilNextRefreshable`
  * stays sub-500 ms so computed waits round to 0 and a stubbed pipeline
  * run never actually sleeps. */
final class TaRefreshStub extends Refresh.Api {
  private val polls = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  override def refreshCheck(accountId: String, checkId: String): String = {
    polls.put(accountId + "/" + checkId, 0)
    "enqueued"
  }

  override def pollStatus(accountId: String, checkId: String): Refresh.PollStatus = {
    val key = accountId + "/" + checkId
    val seed = (accountId + checkId).hashCode & 0x7fffffff
    val n = polls.merge(key, 1, (a, b) => a + b).toInt
    val status = if (n <= seed % 3) "processing" else "success"
    Refresh.PollStatus(status, seed % 500)
  }
}
