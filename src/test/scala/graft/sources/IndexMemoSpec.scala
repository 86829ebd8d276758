package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The memo's concurrency contract (round 18): builds run OUTSIDE the
  * map's locks, so a reentrant ensure from within a build function and
  * bin-neighbor keys cannot deadlock or serialize behind a multi-second
  * build — plus the retry-after-failure and stale-signature rules. */
class IndexMemoSpec extends AnyFunSuite {

  test("a reentrant ensure from inside a build completes (no bin-lock " +
      "deadlock — the ConcurrentHashMap.compute hazard)") {
    var innerTable: String = null
    val outer = IndexMemo.ensure("memo_outer", "sig1", "outer") { t =>
      // previously: building inside compute held the bin lock, and any
      // reentrant ensure whose key hashed to the same bin deadlocked
      innerTable = IndexMemo.ensure("memo_inner", "sig1", "inner")(_ => ())
      assert(t.startsWith("outer_"))
    }
    assert(outer.startsWith("outer_") && innerTable.startsWith("inner_"))
  }

  test("a failed build evicts its promise: the next caller retries and " +
      "can succeed") {
    val boom = intercept[RuntimeException] {
      IndexMemo.ensure("memo_retry", "sig1", "retry")(_ =>
        throw new RuntimeException("build died"))
    }
    assert(boom.getMessage == "build died")
    var built = 0
    val t = IndexMemo.ensure("memo_retry", "sig1", "retry")(_ => built += 1)
    assert(built == 1 && t.startsWith("retry_"),
      "the failed build's promise must not be served to later callers")
  }

  test("a changed listing signature rebuilds exactly once; an unchanged " +
      "one stays free") {
    var builds = 0
    val t1 = IndexMemo.ensure("memo_sig", "sigA", "sig")(_ => builds += 1)
    val t2 = IndexMemo.ensure("memo_sig", "sigA", "sig")(_ => builds += 1)
    assert(t1 == t2 && builds == 1, "an unchanged signature must memo-hit")
    IndexMemo.ensure("memo_sig", "sigB", "sig")(_ => builds += 1)
    assert(builds == 2, "a changed signature must rebuild")
    IndexMemo.ensure("memo_sig", "sigB", "sig")(_ => builds += 1)
    assert(builds == 2, "the rebuilt signature must memo-hit again")
  }

  test("concurrent callers of one (key, signature) get one build; waiters " +
      "receive the owner's table name") {
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new java.util.concurrent.CountDownLatch(1)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (1 to 8).map(_ => Future {
      gate.await()
      IndexMemo.ensure("memo_race", "sig1", "race") { _ =>
        builds.incrementAndGet()
        Thread.sleep(100) // a slow build: waiters must block on the
        // promise, not re-enter the build
      }
    })
    gate.countDown()
    val tables = Await.result(Future.sequence(fs), 30.seconds)
    assert(builds.get() == 1, s"the build ran ${builds.get()} times")
    assert(tables.distinct.size == 1, s"racers disagree: $tables")
  }
}
