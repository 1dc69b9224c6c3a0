package graft.sources

import scala.annotation.tailrec
import scala.util.control.NonFatal

/** Driver-side retry with exponential backoff around per-partition API
  * fetches — the reference's Step Functions Retry blocks as a library
  * (`deployment/aws-trusted-advisor-explorer.template:1218-1236`:
  * TooManyRequests -> MaxAttempts 6, 2 s interval, backoff x2;
  * States.ALL -> MaxAttempts 2). Step Functions MaxAttempts counts
  * RETRIES after the first failed execution, so the total execution
  * budget is attempts + 1 (7 and 3) — mirrored here. Spark task retries
  * (`spark.task.maxFailures`) restart a whole partition read; this wraps
  * the individual HTTP call so a throttled Support/Tagging API response
  * backs off in place instead of failing the task.
  */
object Retry {

  /** `attempts` = the template's MaxAttempts: the number of RETRIES
    * granted after the first failure, so total executions = attempts + 1. */
  final case class Policy(attempts: Int, initialDelayMs: Long, backoff: Double)

  /** TooManyRequestsException policy (template:1222-1227): 6 retries,
    * 7 total executions. */
  val tooManyRequests: Policy = Policy(6, 2000, 2.0)

  /** States.ALL catch-all policy (template:1228-1233): 2 retries,
    * 3 total executions. */
  val statesAll: Policy = Policy(2, 1000, 2.0)

  /** Throttle-shaped failures — the only class the template grants the
    * long 6-attempt budget (template:1222). Matched on type name/message
    * because the engine has no SDK dependency to share exception types
    * with. */
  private val status429 = "(^|\\D)429(\\D|$)".r
  def isThrottle(t: Throwable): Boolean = {
    val s = t.getClass.getSimpleName + " " + String.valueOf(t.getMessage)
    s.contains("TooManyRequests") || s.contains("Throttling") ||
      s.contains("ThrottledException") || s.contains("Rate exceeded") ||
      // standalone 429 only — "4290"/"offset 14295" must not draw the
      // 6-attempt budget for a deterministic failure
      status429.findFirstIn(s).isDefined
  }

  /** Run `body`, retrying on NonFatal exceptions `isRetryable` accepts,
    * sleeping `initialDelayMs * backoff^i` between attempts. Fatal VM
    * errors and interrupts (a task kill) always propagate immediately —
    * they are never retried regardless of the predicate. `sleep` is
    * injectable for tests. The last failure propagates unchanged. */
  def withBackoff[T](policy: Policy,
      isRetryable: Throwable => Boolean = _ => true,
      sleep: Long => Unit = Thread.sleep)(body: => T): T = {
    @tailrec def go(attempt: Int, delayMs: Long): T = {
      // NonFatal excludes InterruptedException, VirtualMachineError, etc. —
      // those rethrow from here without touching the retry budget
      val r = try Right(body) catch { case NonFatal(t) => Left(t) }
      r match {
        case Right(v) => v
        // attempt counts EXECUTIONS; MaxAttempts more may follow the first
        case Left(t) if attempt > policy.attempts || !isRetryable(t) => throw t
        case Left(_) =>
          sleep(delayMs)
          go(attempt + 1, (delayMs * policy.backoff).toLong)
      }
    }
    go(1, policy.initialDelayMs)
  }

  /** The template's retrier list as one wrapper: throttle errors draw from
    * the 6-attempt TooManyRequests budget, every other NonFatal failure
    * from the 2-attempt States.ALL budget — each with its own delay
    * schedule, mirroring how Step Functions matches the FIRST applicable
    * retrier per error (template:1218-1236). */
  def withTemplateRetry[T](sleep: Long => Unit = Thread.sleep)(body: => T): T = {
    var throttleAttempts = 0
    var otherAttempts = 0
    var throttleDelay = tooManyRequests.initialDelayMs
    var otherDelay = statesAll.initialDelayMs
    while (true) {
      val r = try Right(body) catch { case NonFatal(t) => Left(t) }
      r match {
        case Right(v) => return v
        // >: a class's FIRST failure never consumes its retry budget —
        // MaxAttempts counts retries, so budget N allows N+1 executions
        case Left(t) if isThrottle(t) =>
          throttleAttempts += 1
          if (throttleAttempts > tooManyRequests.attempts) throw t
          sleep(throttleDelay)
          throttleDelay = (throttleDelay * tooManyRequests.backoff).toLong
        case Left(t) =>
          otherAttempts += 1
          if (otherAttempts > statesAll.attempts) throw t
          sleep(otherDelay)
          otherDelay = (otherDelay * statesAll.backoff).toLong
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
