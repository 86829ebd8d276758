package graft.queries

import graft.SparkSpec
import graft.plans.{WindowHashes, WinnowPositions}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Robustness pins for the dedup batch: the q36 convergence guard, the
  * q33 cell-count contract check, and the winnowing guarantee as a
  * generated property (previously a prose argument in Dedup.scala). Raw
  * ScalaCheck Gens with a fixed-seed sampler (the scalatest-scalacheck
  * bridge isn't on the offline classpath). */
class DedupRobustnessSpec extends SparkSpec {

  private def forAll[A](g: Gen[A], n: Int = 120)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  test("q36 guard: a chain deeper than the round cap throws, never truncates") {
    import spark.implicits._
    // a 26-node path graph: min-label propagation moves the label one hop
    // per round, so node 25 needs 25 rounds — past the default cap of 20.
    // Force the DISTRIBUTED route (collectLimit = 0): the guard is a
    // propagation-loop contract; the driver union-find route is exact and
    // has no rounds to cap.
    spark.conf.set(Dedup.ResolveCollectLimit, "0")
    try {
      val chain = (0L until 25L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      val e = intercept[IllegalStateException] {
        Dedup.resolveClusters(chain).count()
      }
      assert(e.getMessage.contains("did not converge"),
        s"guard must name the failure: ${e.getMessage}")
      // with a cap past the chain depth it converges to one cluster
      val resolved = Dedup.resolveClusters(chain, maxRounds = 30).collect()
      assert(resolved.length == 26)
      assert(resolved.forall(_.getAs[Long]("canonical") == 0L),
        "every node must resolve to the minimum label")
    } finally spark.conf.unset(Dedup.ResolveCollectLimit)
  }

  test("q36 size route: driver union-find == distributed propagation " +
      "(labels, schema, order) on a mixed component fixture") {
    import spark.implicits._
    // chains, a triangle, singleton-free pairs, shared-min merges — and
    // ids far from dense so hashing assumptions can't hide
    val pairs = Seq(
      (7L, 3L), (3L, 11L), (11L, 7L),          // triangle, min 3
      (100L, 42L), (42L, 99L),                 // chain, min 42
      (1000L, 2000L),                          // pair
      (5L, 6L), (6L, 4L), (4L, 8L), (8L, 2L)   // chain resolving to 2
    ).toDF("doc_a", "doc_b")
    val local = Dedup.resolveClusters(pairs).collect().toSeq
    spark.conf.set(Dedup.ResolveCollectLimit, "0")
    val dist =
      try Dedup.resolveClusters(pairs).collect().toSeq
      finally spark.conf.unset(Dedup.ResolveCollectLimit)
    assert(local == dist,
      s"routes must agree row-for-row: local=$local dist=$dist")
    // names + types must match exactly; nullability is input-derived on
    // the distributed route (non-nullable here from toDF, nullable from
    // parquet in the registered queries) and is not persisted by the
    // verify parquet dump either way
    val localSchema = Dedup.resolveClusters(pairs).schema
      .map(f => (f.name, f.dataType))
    spark.conf.set(Dedup.ResolveCollectLimit, "0")
    val distSchema =
      try Dedup.resolveClusters(pairs).schema.map(f => (f.name, f.dataType))
      finally spark.conf.unset(Dedup.ResolveCollectLimit)
    assert(localSchema == distSchema,
      s"column names/types must match: $localSchema vs $distSchema")
  }

  test("q36 registered query: the conf forces the distributed route " +
      "END-TO-END and the output is row-identical to the collect route " +
      "(the round-21 VERDICT hardening — not just the unit fixture)") {
    // the registered row, default route (collect union-find at this SF)
    val byDefault = graft.SparkEntry.queries("q36_dedup_resolve")(spark, sfDir)
      .collect().toSeq
    spark.conf.set(Dedup.ResolveCollectLimit, "0")
    val byPropagation =
      try graft.SparkEntry.queries("q36_dedup_resolve")(spark, sfDir)
        .collect().toSeq
      finally spark.conf.unset(Dedup.ResolveCollectLimit)
    assert(byDefault.nonEmpty, "fixture produced no clusters")
    assert(byDefault == byPropagation,
      "registered q36 output must not depend on the resolve route")
  }

  test("q33 contract: degenerate cell count fires the engine-side warning") {
    import spark.implicits._
    CellContract.warnings.clear()
    // 400 vectors in 2 cells: cells^2 = 4 << 400 — the blocked join's
    // per-cell volume is quadratic in n, exactly what the check exists for
    val degenerate = (0 until 400)
      .map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("vec_id", "label")
    CellContract.observed(spark, degenerate).count()
    // QueryExecutionListener delivery is async on the listener bus
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (CellContract.warnings.isEmpty && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(!CellContract.warnings.isEmpty,
      "expected a cell-contract warning for the 2-label fixture")
    val msg = CellContract.warnings.peek()
    assert(msg.contains("400") && msg.contains("quadratic"), msg)
    CellContract.warnings.clear()
    // a healthy fixture (cells ~ sqrt(n)) stays silent
    val healthy = (0 until 400)
      .map(i => (i.toLong, s"c${i % 25}"))
      .toDF("vec_id", "label")
    CellContract.observed(spark, healthy).count()
    Thread.sleep(500)
    assert(CellContract.warnings.isEmpty,
      s"healthy fixture must not warn: ${CellContract.warnings.peek()}")
  }

  /** The winnowing guarantee (Schleimer et al., SIGMOD'03), W=48, K=8:
    * two documents sharing any verbatim run of ≥ W+K−1 = 55 chars always
    * share a selected fingerprint — because some K-window of hashes lies
    * entirely inside the run in both documents, and the leftmost-minimum
    * selection picks the same relative position in both. */
  test("winnowing property: a shared >= 55-char run always yields a shared fingerprint") {
    val (w, k) = (48, 8)
    def fingerprints(text: String): Set[(Long, String)] = {
      val hs = WindowHashes.compute(text, w)
      val ps = WinnowPositions.compute(hs, k)
      (0 until ps.numElements()).map { i =>
        val p = ps.getInt(i)
        (hs.getLong(p - 1), text.substring(p - 1, p - 1 + w))
      }.toSet
    }
    val lowerStr = (n: Gen[Int]) =>
      n.flatMap(len => Gen.listOfN(len, Gen.alphaLowerChar).map(_.mkString))
    val gen = for {
      run <- lowerStr(Gen.choose(55, 90)) // the shared verbatim run
      pre1 <- lowerStr(Gen.choose(0, 60))
      post1 <- lowerStr(Gen.choose(0, 60))
      pre2 <- lowerStr(Gen.choose(0, 60))
      post2 <- lowerStr(Gen.choose(0, 60))
    } yield (pre1 + run + post1, pre2 + run + post2)
    forAll(gen) { case (doc1, doc2) =>
      val shared = fingerprints(doc1).intersect(fingerprints(doc2))
      assert(shared.nonEmpty,
        s"no shared fingerprint for docs sharing a 55+ run:\n$doc1\n$doc2")
    }
  }

  test("winnowing density: selected fingerprints are a bounded fraction of windows") {
    // scale sanity, not correctness: winnowing selects ~2/(K+1) of
    // windows in expectation; pin a generous upper bound so a regression
    // to "select every window" cannot hide
    val (w, k) = (48, 8)
    val gen = Gen.listOfN(600, Gen.alphaLowerChar).map(_.mkString)
    forAll(gen, n = 40) { text =>
      val hs = WindowHashes.compute(text, w)
      val ps = WinnowPositions.compute(hs, k)
      val windows = hs.numElements()
      assert(ps.numElements() <= math.max(2, windows / 2),
        s"winnow selected ${ps.numElements()} of $windows windows")
    }
  }
}
