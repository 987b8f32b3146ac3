package graft

import org.apache.spark.sql.functions._
import graft.ops.VectorOps

/** Semantic invariants of q_semantic_dedup (SemDeDup): every emitted
  * row is a genuine within-cluster duplicate whose surviving witness
  * is strictly more marginal (lower centroid similarity, tie-broken
  * by id) — i.e. the paper's keep-farthest-from-centroid rule holds
  * pair-locally for every drop decision. */
class SemanticDedupSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("drops are tau-similar, same-cluster, and dominated by their witness") {
    val out = VectorOps.semanticDedup(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty, "fixture should produce dropped vectors")

    // recompute the centroid assignment exactly as the operator does:
    // nearest of the 16 deterministic centroids, r6 cosine, id tiebreak
    val e = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        sqrt(graft.functions.GraftFunctions.array_dot(col("embedding"), col("embedding"))).as("norm"))
    val cents = e.where(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"),
        col("norm").as("cent_norm"))
    val assignW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cent_id"))
    val assign = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cent_id"),
        round(graft.functions.GraftFunctions.array_dot(col("embedding"), col("cent_emb"))
          / (col("norm") * col("cent_norm")), 6).as("ccos"))
      .withColumn("ar", row_number().over(assignW)).where(col("ar") === 1)
      .select(col("vec_id"), col("cent_id").as("cluster_id"), col("ccos"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    rows.foreach { r =>
      val (cluster, dropped, witness, cos) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(cos >= 0.25, s"pair ($dropped,$witness) below tau: $cos")
      assert(assign(dropped)._1 == cluster && assign(witness)._1 == cluster,
        s"pair ($dropped,$witness) not both in cluster $cluster")
      val (dc, wc) = (assign(dropped)._2, assign(witness)._2)
      assert(wc < dc || (wc == dc && witness < dropped),
        s"witness $witness (ccos=$wc) does not dominate dropped $dropped (ccos=$dc)")
    }
    // a vector is dropped at most once (one row per dropped vec)
    val droppedIds = rows.map(_.getLong(1))
    assert(droppedIds.distinct.length == droppedIds.length)
  }
}
