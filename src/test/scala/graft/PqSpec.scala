package graft

import org.apache.spark.sql.functions._
import graft.ops.VectorOps

/** Product-quantization invariants on the driver testdata: the
  * codebook seeds must be fixed points (a codeword quantizes to
  * itself with zero error — x·x + c·c − 2x·c is EXACTLY 0.0 in IEEE
  * when c is the same fold as x), codes stay inside the 16-codeword
  * range, and non-seed vectors carry strictly positive reconstruction
  * error (the corpus has no duplicate of a seed vector).
  */
class PqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val rows =
    VectorOps.productQuantize(spark, sf).collect()

  test("codebook seed vectors quantize to themselves with zero error") {
    val seeds = rows.filter(_.getAs[Long]("vec_id") < 16)
    assert(seeds.length == 16)
    seeds.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      (0 to 3).foreach { k =>
        assert(r.getAs[Long](s"code_$k") == id,
          s"seed $id code_$k drifted to ${r.getAs[Long](s"code_$k")}")
      }
      assert(r.getAs[Long]("err_u") == 0L, s"seed $id has nonzero error")
    }
  }

  test("every code addresses the 16-codeword codebook") {
    rows.foreach { r =>
      (0 to 3).foreach { k =>
        val c = r.getAs[Long](s"code_$k")
        assert(c >= 0 && c < 16, s"vec ${r.getAs[Long]("vec_id")} code_$k=$c")
      }
    }
  }

  test("non-seed vectors have strictly positive reconstruction error") {
    val nonSeeds = rows.filter(_.getAs[Long]("vec_id") >= 16)
    assert(nonSeeds.nonEmpty)
    assert(nonSeeds.forall(_.getAs[Long]("err_u") > 0L))
  }
}
