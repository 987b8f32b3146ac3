package graft

import org.apache.spark.sql.functions._
import graft.functions.SrpSignatures
import graft.ops.VectorOps

/** Recall/precision of the banded SRP geometry on PLANTED near-dups
  * (the driver embeddings have no pair above cos ≈ 0.5, so the
  * operator's own output can't demonstrate the high-cosine recall the
  * banding is built for): 200 base vectors each get a small-noise copy
  * (cos ≈ 0.99). With 4 bands × 16 bits the per-band collision
  * probability for such a pair is (1 − θ/π)^16 ≈ 0.8, so the OR over
  * 4 bands catches ≈ 99.9%; a random pair (cos ≈ 0) collides with
  * probability ≈ 4·2⁻¹⁶. Fixed seed ⇒ deterministic outcome. */
class SrpRecallSpec extends SparkSpec {

  test("banded signatures catch planted near-dups and reject random pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42L)
    val base = Seq.fill(200)(Array.fill(64)((rnd.nextFloat() - 0.5f) * 2f))
    val rows =
      base.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) } ++
        base.zipWithIndex.map { case (v, i) =>
          (i + 10000L, v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f).toSeq)
        }
    val sigs = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        SrpSignatures.signatures(col("embedding").cast("array<float>"),
          VectorOps.srpPlanes(VectorOps.SrpBands * VectorOps.SrpBits),
          VectorOps.SrpBits).as("band_sigs"))
      .as[(Long, Seq[Long])].collect().toMap

    def collide(a: Long, b: Long): Boolean =
      sigs(a).zip(sigs(b)).exists { case (x, y) => x == y }

    // recall over the 200 planted (i, i+10000) near-dup pairs
    val caught = (0L until 200L).count(i => collide(i, i + 10000L))
    assert(caught >= 190, s"recall ${caught / 200.0} below 0.95 on cos≈0.99 pairs")

    // precision proxy: random (i, j) base pairs almost never collide
    val randomPairs = for (i <- 0L until 200L; j <- (i + 1) until 200L) yield (i, j)
    val falseCand = randomPairs.count { case (i, j) => collide(i, j) }
    assert(falseCand <= randomPairs.size / 100,
      s"$falseCand/${randomPairs.size} random pairs collided (> 1%)")
  }
}
