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
    assert(t2 <= t1 + 1e-6, s"iteration 2 increased cost: $t1 -> $t2")
    assert(t3 <= t2 + 1e-6, s"iteration 3 increased cost: $t2 -> $t3")
  }

  test("q58: every dropped vector has a lower-id keeper above the threshold") {
    val asg = Clustering.kmeansAssignments(spark, sfDir)
      .select(col("vec_id"), col("cluster"))
    val out = SparkEntry.queries("q58_semdedup")(spark, sfDir).collect()
    assert(out.nonEmpty, "no semantic duplicates at all — threshold fixture broke")
    assert(out.forall(r => r.getLong(2) < r.getLong(0)), "kept_by not lower-id")
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
  }

  test("q57/q58: deterministic across invocations") {
    def snap(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, sfDir).collect().toSeq.map(_.toString)
    assert(snap("q57_kmeans") == snap("q57_kmeans"))
    assert(snap("q58_semdedup") == snap("q58_semdedup"))
  }
}
