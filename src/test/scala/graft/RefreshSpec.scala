package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Refresh, TaRefreshStub}

/** P9/P10 poll loop: wait-time math pinned to the verify lambda
  * (verify-ta-check-status-lambda.py:78-84) and the Choice-state loop
  * (template:1286-1304), plus the explicit termination bound the
  * reference lacks. Pure driver logic — no Spark session. */
class RefreshSpec extends AnyFunSuite {

  test("wait-time math: round-half-even millis/1000, waits over 1h skipped") {
    // Python 3 round() is half-even; these pin the exact lambda results
    assert(Refresh.waitTimeInSec(0) == 0)
    assert(Refresh.waitTimeInSec(500) == 0)      // round(0.5) = 0
    assert(Refresh.waitTimeInSec(1500) == 2)     // round(1.5) = 2
    assert(Refresh.waitTimeInSec(2500) == 2)     // round(2.5) = 2
    assert(Refresh.waitTimeInSec(2501) == 3)
    assert(Refresh.waitTimeInSec(3600000) == 3600)  // exactly 1h: allowed
    assert(Refresh.waitTimeInSec(3600499) == 3600)  // rounds down to 1h
    assert(Refresh.waitTimeInSec(3600501) == 0)     // 3601 > 3600: skip
    assert(Refresh.waitTimeInSec(86400000) == 0)
  }

  test("choice state: only enqueued/processing re-enter the loop") {
    assert(Refresh.pollAgain("enqueued") && Refresh.pollAgain("processing"))
    assert(!Refresh.pollAgain("success") && !Refresh.pollAgain("none") &&
      !Refresh.pollAgain("abandoned") && !Refresh.pollAgain(""))
  }

  private final class ScriptedApi(script: Refresh.PollStatus*) extends Refresh.Api {
    val refreshes = new java.util.concurrent.atomic.AtomicInteger
    val pollsSeen = new java.util.concurrent.atomic.AtomicInteger
    override def refreshCheck(a: String, c: String): String = {
      refreshes.incrementAndGet(); "enqueued"
    }
    override def pollStatus(a: String, c: String): Refresh.PollStatus = {
      val i = pollsSeen.getAndIncrement()
      script(math.min(i, script.size - 1))
    }
  }

  test("loop: refresh, verify immediately, wait with the PREVIOUS poll's time, stop on success") {
    val api = new ScriptedApi(
      Refresh.PollStatus("enqueued", 1500),   // -> wait 2
      Refresh.PollStatus("processing", 500),  // -> wait 0 (no sleep call)
      Refresh.PollStatus("success", 99999))
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = Refresh.refreshAndAwait(api, "111111111111", "Qch7DwouX1",
      sleep = slept += _, retrySleep = _ => ())
    assert(api.refreshes.get() == 1)
    assert(out.polls == 3 && out.finalStatus == "success" && !out.exhausted)
    assert(out.waitsSec == Seq(2, 0), "each wait uses the prior poll's millis")
    assert(slept.toSeq == Seq(2), "zero waits must not sleep")
  }

  test("termination: a permanently-processing check stops at maxPolls, flagged exhausted") {
    val api = new ScriptedApi(Refresh.PollStatus("processing", 100))
    val out = Refresh.refreshAndAwait(api, "1", "c", maxPolls = 5,
      sleep = _ => (), retrySleep = _ => ())
    assert(out.polls == 5 && out.exhausted && out.finalStatus == "processing")
  }

  test("verify calls draw the template retry budgets (throttle backs off in place)") {
    var failures = 2
    val api = new Refresh.Api {
      override def refreshCheck(a: String, c: String) = "enqueued"
      override def pollStatus(a: String, c: String) = {
        if (failures > 0) { failures -= 1
          throw new RuntimeException("TooManyRequestsException: Rate exceeded") }
        Refresh.PollStatus("success", 0)
      }
    }
    val retrySlept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = Refresh.refreshAndAwait(api, "1", "c",
      sleep = _ => (), retrySleep = retrySlept += _)
    assert(out.finalStatus == "success" && out.polls == 1)
    assert(retrySlept.toSeq == Seq(2000, 4000),
      "throttle budget: 2s then 4s backoff (template:1222-1227)")
  }

  test("fan-out: every pair polled to completion on the bounded pool; stub never sleeps") {
    val api = new TaRefreshStub
    val pairs = for (a <- 1 to 6; c <- Seq("Qch7DwouX1", "DAvU99Dc4C"))
      yield (f"${100000000000L + a}%012d", c)
    val slept = new java.util.concurrent.atomic.AtomicLong
    val outs = Refresh.awaitAll(api, pairs, sleep = slept.addAndGet(_): Unit,
      retrySleep = _ => (), parallelism = 4)
    assert(outs.size == pairs.size)
    assert(outs.forall(o => o.finalStatus == "success" && !o.exhausted))
    assert(outs.map(o => (o.accountId, o.checkId)).toSet == pairs.toSet)
    assert(slept.get() == 0, "stub waits all round to zero seconds")
    // the stub's poll count is deterministic per pair: 1 + seed%3
    outs.foreach { o =>
      val seed = (o.accountId + o.checkId).hashCode & 0x7fffffff
      assert(o.polls == 1 + seed % 3)
    }
  }
}
