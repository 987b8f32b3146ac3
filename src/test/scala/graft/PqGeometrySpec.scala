package graft

import org.apache.spark.sql.Row
import graft.ops.VectorOps

/** PQ geometry as a demonstrated runtime knob (the SRP-geometry
  * pattern): `spark.graft.pq.m` / `spark.graft.pq.k` reconfigure the
  * encoder and the ADC search per session, and the derived oracles
  * follow. m is the compression/accuracy lever, k the codebook
  * granularity — this spec proves both operators actually work at a
  * second (8 × 8) geometry; full DuckDB parity at a non-default
  * geometry is probed by flipping the defaults, since the declared
  * oracle is generated from them.
  */
class PqGeometrySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def withGeometry[A](m: Int, k: Int)(body: => A): A = {
    spark.conf.set("spark.graft.pq.m", m.toString)
    spark.conf.set("spark.graft.pq.k", k.toString)
    try body
    finally {
      spark.conf.unset("spark.graft.pq.m")
      spark.conf.unset("spark.graft.pq.k")
    }
  }

  test("conf plumbing: explicit default geometry equals the default run") {
    val dflt = VectorOps.productQuantize(spark, dir).collect().toSeq
    val explicit = withGeometry(VectorOps.PqM, VectorOps.PqK) {
      VectorOps.productQuantize(spark, dir).collect().toSeq
    }
    assert(explicit == dflt)
  }

  test("8x8 geometry: eight code columns in [0, 8), seeds are fixed points") {
    val rows: Array[Row] = withGeometry(8, 8) {
      VectorOps.productQuantize(spark, dir).collect()
    }
    assert(rows.head.schema.fieldNames.count(_.startsWith("code_")) == 8)
    rows.foreach { r =>
      (0 to 7).foreach { i =>
        val c = r.getAs[Long](s"code_$i")
        assert(c >= 0 && c < 8, s"vec ${r.getAs[Long]("vec_id")} code_$i=$c")
      }
    }
    rows.filter(_.getAs[Long]("vec_id") < 8).foreach { r =>
      val id = r.getAs[Long]("vec_id")
      (0 to 7).foreach(i => assert(r.getAs[Long](s"code_$i") == id))
      assert(r.getAs[Long]("err_u") == 0L, s"seed $id has nonzero error")
    }
  }

  test("ADC search works at 8x8: five ranked neighbors per query") {
    val rows = withGeometry(8, 8) {
      VectorOps.annPqSearch(spark, dir).collect()
    }
    assert(rows.length == 50) // 10 queries x top-5
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.keySet == (0L until 10L).toSet)
    byQ.values.foreach { g =>
      assert(g.map(_.getAs[Long]("rn")).sorted.toSeq == (1L to 5L))
    }
  }

  test("the derived oracles follow the geometry") {
    val o = VectorOps.pqOracle(8, 8)
    assert(o.contains("embedding[9:16]")) // 8-dim subspace slicing
    assert(o.contains("vec_id < 8")) // 8-codeword codebook
    assert(o.contains("code_7") && !o.contains("code_8"))
    // the declared driver oracles are exactly the default-geometry ones
    assert(VectorOps.oracles("q_product_quantize") ==
      VectorOps.pqOracle(VectorOps.PqM, VectorOps.PqK))
    assert(VectorOps.oracles("q_ann_pq_search") ==
      VectorOps.annPqOracle(VectorOps.PqM, VectorOps.PqK))
  }
}
