package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Behavioral pins for the k-means / SemDeDup family (q57/q58). The
  * DuckDB oracle proves cross-engine bit-exactness; these pin the
  * algorithmic properties the oracle can't see: Lloyd's descent, argmin
  * validity, and SemDeDup's keep-one-representative contract.
  */
class ClusteringSpec extends SparkSpec {

  test("q57: one row per vector, clusters from the seed id space") {
    val out = SparkEntry.queries("q57_kmeans")(spark, sfDir).collect()
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(out.length == n, s"expected $n assignment rows, got ${out.length}")
    assert(out.map(_.getLong(0)).distinct.length == n, "duplicate vec_id")
    val clusters = out.map(_.getLong(1)).distinct
    assert(clusters.forall(c => c >= 0 && c < 8), s"cluster outside seed space: ${clusters.mkString(",")}")
    assert(clusters.length >= 2, "degenerate single-cluster result on real data")
    // dist is a float spelling of a non-negative quantity; allow rounding
    assert(out.forall(_.getDouble(2) >= -1e-6), "negative squared distance")
  }

  test("q57: Lloyd iterations do not increase total within-cluster distance") {
    def total(iters: Int): Double =
      Clustering.kmeansAssignments(spark, sfDir, iters)
        .agg(sum(col("dist"))).collect()(0).getDouble(0)
    val t1 = total(1)
    val t2 = total(2)
    val t3 = total(3)
    // relative tolerance: the cross-run aggregation order of the double
    // sum is nondeterministic, so at convergence (t3 == t2 mathematically)
    // reassociation noise ~nPartitions·eps·total can exceed any absolute
    // epsilon — scale the slack to the magnitude being compared
    def leq(a: Double, b: Double) = a <= b + 1e-9 * math.max(1.0, b.abs)
    assert(leq(t2, t1), s"iteration 2 increased cost: $t1 -> $t2")
    assert(leq(t3, t2), s"iteration 3 increased cost: $t2 -> $t3")
  }

  test("q58: dropped/survivor partition — no two survivors are similar cell-mates") {
    val asg = Clustering.kmeansAssignments(spark, sfDir)
      .select(col("vec_id"), col("cluster"))
    val out = SparkEntry.queries("q58_semdedup")(spark, sfDir).collect()
    assert(out.nonEmpty, "no semantic duplicates at all — threshold fixture broke")
    // dup_of is a lower-id WITNESS (duplicate evidence; it may itself be
    // dropped in a similarity chain — documented greedy semantics)
    assert(out.forall(r => r.getLong(2) < r.getLong(0)), "dup_of not lower-id")
    // each (dropped, cluster) matches the dropped vector's actual cell
    val cellOf = asg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.forall(r => cellOf(r.getLong(0)) == r.getLong(1)),
      "reported cluster differs from the k-means assignment")
    // spot-verify one pair's cosine against the raw embeddings
    val r0 = out.head
    val e = Similarity.normedVectors(spark, sfDir)
    val cos = e.as("a").filter(col("a.vec_id") === r0.getLong(2))
      .crossJoin(e.as("b").filter(col("b.vec_id") === r0.getLong(0)))
      .select((Similarity.dot(col("a.v"), col("b.v")) /
        (col("a.nrm") * col("b.nrm"))).as("c"))
      .collect()(0).getDouble(0)
    assert(cos >= 0.35, s"reported duplicate pair has cosine $cos < 0.35")
    // the load-bearing retention contract: among SURVIVORS (vectors not
    // in the output), no same-cell pair sits above the threshold — any
    // such pair would have witnessed its higher-id member into the output
    val dropped = out.map(_.getLong(0)).toSet
    val survivors = e.join(asg, "vec_id")
      .filter(!col("vec_id").isInCollection(dropped))
    val cos2 = Similarity.dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))
    val leak = survivors.as("a").join(survivors.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.vec_id") < col("b.vec_id") && cos2 >= 0.35)
      .count()
    assert(leak == 0, s"$leak similar survivor pairs escaped dedup")
  }

  test("q57/q58: deterministic across invocations") {
    def snap(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, sfDir).collect().toSeq.map(_.toString)
    assert(snap("q57_kmeans") == snap("q57_kmeans"))
    assert(snap("q58_semdedup") == snap("q58_semdedup"))
  }
}
