package graft

import graft.ops.{LlmOps, VectorOps}

/** ANN quality: IVF recall against the brute-force baseline, and the
  * multi-probe monotonicity guarantee (probing 2 clusters can only add
  * candidates, so recall@3 must not decrease). */
class AnnRecallSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def topSets(df: org.apache.spark.sql.DataFrame,
                      qidCol: String, cidCol: String): Map[Long, Set[Long]] =
    df.select(qidCol, cidCol).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  test("multi-probe recall@3 >= single-probe recall@3 against brute force") {
    val brute = topSets(
      LlmOps.cosineTopk(spark, sfDir).where("rn <= 3"), "qid", "cid")
    val single = topSets(VectorOps.annIvf(spark, sfDir), "qid", "cid")
    val multi = topSets(VectorOps.annIvfMultiprobe(spark, sfDir), "qid", "cid")

    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = brute.keys.toSeq.map { q =>
        approx.getOrElse(q, Set.empty).intersect(brute(q)).size / 3.0
      }
      per.sum / per.length
    }
    val rs = recall(single)
    val rm = recall(multi)
    assert(rm >= rs, s"multiprobe recall $rm < single-probe $rs")
    assert(rm > 0.0, "multiprobe recall must find at least some true neighbors")
  }
}
