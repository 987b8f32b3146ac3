package graft

import org.apache.spark.sql.functions._
import graft.functions.SrpSignatures
import graft.ops.VectorOps

/** The SRP geometry as a demonstrated runtime knob (VERDICT r03 item
  * 8): `spark.graft.srp.bands` / `spark.graft.srp.bits` reconfigure
  * q_embedding_neardup per session, and the derived oracle follows.
  * 2^bits is the bucket-granularity lever the 100 TB story leans on —
  * this spec proves the operator actually works at a second (6×24)
  * geometry instead of just stating the lever exists. */
class SrpGeometrySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def neardupAt(bands: Int, bits: Int): Seq[(Long, Long, Double)] = {
    import spark.implicits._
    spark.conf.set("spark.graft.srp.bands", bands.toString)
    spark.conf.set("spark.graft.srp.bits", bits.toString)
    try VectorOps.embeddingNeardup(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    finally {
      spark.conf.unset("spark.graft.srp.bands")
      spark.conf.unset("spark.graft.srp.bits")
    }
  }

  test("conf plumbing: explicit default geometry equals the default run") {
    val dflt = {
      import spark.implicits._
      VectorOps.embeddingNeardup(spark, dir)
        .as[(Long, Long, Double)].collect().toSeq
    }
    assert(neardupAt(VectorOps.SrpBands, VectorOps.SrpBits) == dflt)
  }

  test("6x24 geometry: operator runs, pairs verified, high bits in use") {
    import spark.implicits._
    val got = neardupAt(6, 24)
    // exact-cosine verification holds at any geometry
    assert(got.forall(_._3 >= 0.25), s"unverified pair in $got")
    // the signatures really span 24 bits (packing beyond 16 works):
    // with 2^24 buckets and ~balanced hyperplanes, max sig > 2^16
    val sigs = Tables(spark, dir, "embeddings")
      .select(SrpSignatures.signatures(col("embedding"),
        VectorOps.srpPlanes(6 * 24), 24).as("s"))
      .select(explode(col("s")).as("sig"))
      .agg(max("sig"), min("sig")).as[(Long, Long)].head()
    assert(sigs._1 > 0xFFFFL, s"max sig ${sigs._1} fits in 16 bits")
    assert(sigs._2 >= 0L)
  }

  test("recall holds at both geometries on planted near-dups") {
    import spark.implicits._
    // tight-noise copies (cos ≈ 0.997): per-bit collision ≈ 0.975 ⇒
    // expected recall ≈ 1-(1-0.975^16)^4 ≈ 0.97 at 4×16 and
    // ≈ 1-(1-0.975^24)^6 ≈ 0.99 at 6×24
    val rnd = new scala.util.Random(7L)
    val base = Seq.fill(200)(Array.fill(64)((rnd.nextFloat() - 0.5f) * 2f))
    val rows =
      base.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) } ++
        base.zipWithIndex.map { case (v, i) =>
          (i + 10000L, v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f).toSeq)
        }
    def recallAt(bands: Int, bits: Int): Int = {
      val sigs = rows.toDF("vec_id", "embedding")
        .select(col("vec_id"),
          SrpSignatures.signatures(col("embedding").cast("array<float>"),
            VectorOps.srpPlanes(bands * bits), bits).as("band_sigs"))
        .as[(Long, Seq[Long])].collect().toMap
      (0L until 200L).count { i =>
        sigs(i).zip(sigs(i + 10000L)).exists { case (x, y) => x == y }
      }
    }
    val r16 = recallAt(4, 16)
    val r24 = recallAt(6, 24)
    assert(r16 >= 180, s"4x16 recall $r16/200 below 0.9")
    assert(r24 >= 180, s"6x24 recall $r24/200 below 0.9")
  }

  test("the derived oracle follows the geometry") {
    val o = VectorOps.neardupOracle(6, 24)
    assert(o.contains("range(0, 144)")) // 6 bands × 24 planes
    assert(o.contains("// 24") && o.contains("% 24"))
    // and the declared driver oracle is exactly the default-geometry one
    assert(VectorOps.oracles("q_embedding_neardup") ==
      VectorOps.neardupOracle(VectorOps.SrpBands, VectorOps.SrpBits))
  }
}
