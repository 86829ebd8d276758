package graft.sources

import graft.{SparkEntry, SparkSpec}

/** The persisted ANN index: parity with the recompute-per-run LSH path
  * (q35) at the same banding, and the property that makes it an index —
  * bucket pruning visible in the probe scan. */
class AnnIndexSpec extends SparkSpec {

  test("topK over the persisted index equals q35's lshTopK exactly") {
    AnnIndex.build(spark, sfDir, "ann_idx_parity", tables = 4, bits = 8,
      buckets = 16)
    val got = AnnIndex.topK(spark, "ann_idx_parity", nAnchors = 20, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val want = SparkEntry.queries("q35_ann_lsh")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.toSeq == want.toSeq,
      s"index probe diverges from lshTopK: got=${got.take(5).toSeq} want=${want.take(5).toSeq}")
  }

  test("a small probe set prunes buckets: the scan reads a strict subset") {
    AnnIndex.build(spark, sfDir, "ann_idx_prune", tables = 4, bits = 8,
      buckets = 64)
    val probe = AnnIndex.topK(spark, "ann_idx_prune", nAnchors = 2, k = 5)
    val plan = probe.queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    assert(sel.isDefined, s"no bucket pruning in the probe scan:\n$plan")
    val (selected, total) = (sel.get.group(1).toInt, sel.get.group(2).toInt)
    assert(total == 64 && selected < total,
      s"expected a pruned scan, got $selected out of $total")
    // and the pruned probe still returns ranked neighbors
    assert(probe.collect().nonEmpty)
  }
}
