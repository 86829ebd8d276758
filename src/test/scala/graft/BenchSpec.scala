package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness must be failure-honest: a throwing query can never
  * masquerade as a fast success (round 9's harness swallowed exceptions,
  * so a query breaking after 0.1 s looked like a speedup). */
class BenchSpec extends AnyFunSuite {

  test("timeOne records a failure, never a phantom success") {
    val (t, ok) = Bench.timeOne(throw new RuntimeException("boom"))
    assert(!ok)
    assert(t >= 0.0)
    val (_, ok2) = Bench.timeOne(())
    assert(ok2)
  }

  test("renderJson marks failed queries -1, excludes them from total, lists errors") {
    val results = Seq(
      ("q_ok", Seq(1.0, 2.0, 3.0), false),
      ("q_broken", Seq(0.1, 0.1, 0.1), true),
      ("q_ok2", Seq(4.0, 4.0, 4.0), false))
    val json = Bench.renderJson(results, passes = 3, sfDir = "/x")
    assert(json.contains("\"q_broken\":-1"), json)
    assert(json.contains("\"errors\":[\"q_broken\"]"), json)
    // total = 2.0 + 4.0, never the broken query's phantom 0.1
    assert(json.contains("\"value\":6.000"), json)
    assert(json.contains("\"q_ok\":2.000"), json)
  }

  test("renderJson reports per-query min alongside the median") {
    val json = Bench.renderJson(Seq(
      ("q_ok", Seq(3.0, 1.0, 2.0), false),
      ("q_broken", Seq(0.1), true)), passes = 3, sfDir = "/x")
    // min is the intrinsic-cost estimate (transients only add time);
    // failed queries stay -1 in the min map too.
    assert(json.contains("\"min\":{\"q_ok\":1.000,\"q_broken\":-1}"), json)
    assert(json.contains("\"q_ok\":2.000"), json)
  }

  test("renderJson with no failures emits an empty errors list") {
    val json = Bench.renderJson(Seq(("q", Seq(1.0), false)), 3, "/x")
    assert(json.contains("\"errors\":[]"), json)
    assert(json.contains("\"value\":1.000"), json)
  }

  test("median is the across-runs median (odd and even sample counts)") {
    assert(Bench.median(Seq(5.0, 1.0, 3.0)) == 3.0)
    assert(Bench.median(Seq(4.0, 1.0, 3.0, 2.0)) == 2.5)
  }

  test("the heavy dedup family is a subset of the headline registry") {
    val names = SparkEntry.registry.filter(_.headline).map(_.name).toSet
    val missing = Bench.heavy -- names
    assert(missing.isEmpty,
      s"heavy-pass queries not in the headline set: $missing")
  }
}
