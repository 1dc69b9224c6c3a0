package graft.sources

import scala.annotation.tailrec

/** Driver-side retry with exponential backoff around per-partition API
  * fetches — the reference's Step Functions Retry blocks as a library
  * (`deployment/aws-trusted-advisor-explorer.template:1218-1236`:
  * TooManyRequests -> 6 attempts, 2 s interval, backoff x2;
  * States.ALL -> 2 attempts). Spark task retries
  * (`spark.task.maxFailures`) restart a whole partition read; this wraps
  * the individual HTTP call so a throttled Support/Tagging API response
  * backs off in place instead of failing the task.
  */
object Retry {

  final case class Policy(attempts: Int, initialDelayMs: Long, backoff: Double)

  /** TooManyRequestsException policy (template:1222-1227). */
  val tooManyRequests: Policy = Policy(6, 2000, 2.0)

  /** States.ALL catch-all policy (template:1228-1233). */
  val statesAll: Policy = Policy(2, 1000, 2.0)

  /** Run `body`, retrying on exceptions `isRetryable` accepts, sleeping
    * `initialDelayMs * backoff^i` between attempts. `sleep` is injectable
    * for tests. The last failure propagates unchanged. */
  def withBackoff[T](policy: Policy,
      isRetryable: Throwable => Boolean = _ => true,
      sleep: Long => Unit = Thread.sleep)(body: => T): T = {
    @tailrec def go(attempt: Int, delayMs: Long): T = {
      val r = try Right(body) catch { case t: Throwable => Left(t) }
      r match {
        case Right(v) => v
        case Left(t) if attempt >= policy.attempts || !isRetryable(t) => throw t
        case Left(_) =>
          sleep(delayMs)
          go(attempt + 1, (delayMs * policy.backoff).toLong)
      }
    }
    go(1, policy.initialDelayMs)
  }
}
