package graft

import org.apache.spark.sql.functions._
import graft.ops.VectorOps

/** The claim in q_kmeans_step's scaladoc — "iterating to convergence
  * is a driver-side loop over this step with reseeded centroid
  * literals" — exercised for real: three training rounds where each
  * round's centroids come from the previous distributed step's
  * micro-unit output, with the spherical-k-means objective (mean max
  * cosine of each vector to its centroid set) evaluated on a
  * collected copy of the corpus. The objective must improve overall
  * and never collapse between rounds. */
class KmeansTrainSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("reseeded step loop improves the clustering objective") {
    import spark.implicits._
    val vecs = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()

    def objective(cents: Seq[Seq[Float]]): Double =
      vecs.map { case (_, v) => cents.map(c => cos(v, c)).max }.sum / vecs.length

    def frame(cs: Seq[(Long, Seq[Float])]) =
      cs.toDF("cent_id", "cent_emb").select(col("cent_id"), col("cent_emb"),
        sqrt(graft.functions.GraftFunctions.array_dot(
          col("cent_emb"), col("cent_emb"))).as("cent_norm"))

    var cents: Seq[(Long, Seq[Float])] =
      vecs.filter(_._1 < 16).map { case (id, v) => (id, v) }.toSeq
    val objs = scala.collection.mutable.ArrayBuffer(objective(cents.map(_._2)))
    (1 to 3).foreach { _ =>
      val out = VectorOps.kmeansStepFrom(spark, sf, frame(cents)).collect()
      cents = out.groupBy(_.getAs[Long]("cluster_id")).toSeq.sortBy(_._1)
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getAs[Long]("dim"))
            .map(r => (r.getAs[Long]("centroid_u") / 1e6).toFloat).toSeq
        }
      objs += objective(cents.map(_._2))
    }
    // between rounds: never collapses (micro-unit rounding tolerance)
    objs.sliding(2).foreach { case scala.collection.mutable.ArrayBuffer(a, b) =>
      assert(b >= a - 0.01, s"objective collapsed: $objs")
    }
    // overall: trained centroids beat the raw seeds
    assert(objs.last > objs.head, s"training did not improve: $objs")
  }
}
