package graft

import org.apache.spark.sql.functions._
import graft.ops.{EventOps, LlmOps, RelationalOps, TextOps, VectorOps}

/** Invariants of the round-7 operators beyond the DuckDB hash gate:
  * properties that must hold at ANY scale, not just equality at the
  * gate SF.
  */
class R7OpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("vocab saturation accounts for every 3-gram type exactly once") {
    val rows = TextOps.vocabSaturation(spark, sfDir).collect()
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 32))
    // cumulative ends at the corpus's distinct type count
    val total = TextOps.ngramNovelty(spark, sfDir)
      .agg(sum(col("n_novel"))).collect()(0).getLong(0)
    assert(rows.map(_.getLong(1)).sum == total,
      "per-slice new types must partition the type space")
    assert(rows.last.getLong(2) == total)
    // cumulative is monotone
    val cums = rows.map(_.getLong(2)).toSeq
    assert(cums == cums.sorted)
  }

  test("ngram novelty: the first doc is all-novel, shares are in [0, 1e6]") {
    val rows = TextOps.ngramNovelty(spark, sfDir).collect()
    assert(rows.head.getLong(0) == rows.map(_.getLong(0)).min)
    assert(rows.head.getLong(3) == 1000000L,
      "the earliest doc can only contain first-seen grams")
    assert(rows.forall(r => r.getLong(3) >= 0L && r.getLong(3) <= 1000000L))
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)))
  }

  test("lsh bucket skew: docs partition per band; pair mass bounds the candidates") {
    val skew = LlmOps.lshBucketSkew(spark, sfDir).collect()
    val perBand = skew.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(3)).sum).toMap
    // every band sees the same doc population (one sig per doc per band)
    assert(perBand.values.toSet.size == 1, s"bands disagree: $perBand")
    // sum over buckets of C(c,2) ≥ distinct candidate pairs (pairs
    // sharing k bands are counted k times here, once in the dedup op)
    val pairMass = skew.map(_.getLong(4)).sum
    val candidates = SparkEntry.queries("q_minhash_dedup")(spark, sfDir)
      .count()
    assert(pairMass >= candidates)
    // bins are consistent: a bucket of size c lands in bin bitlen(c)
    assert(skew.forall { r =>
      val bin = r.getLong(1); val maxB = r.getLong(5)
      (java.lang.Long.SIZE - java.lang.Long.numberOfLeadingZeros(maxB)) >= bin
    })
  }

  test("fuzzy blocked join emits ordered within-block pairs at distance <= 2") {
    val rows = RelationalOps.fuzzyBlockedJoin(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (block, a, b) = (r.getString(0), r.getString(1), r.getString(2))
      assert(a < b)
      assert(a.endsWith(" " + block) || a == block)
      assert(b.endsWith(" " + block) || b == block)
      assert(r.getLong(3) >= 1L && r.getLong(3) <= 2L)
      assert(r.getLong(6) == r.getLong(4) * r.getLong(5))
    }
  }

  test("join size audit: rows total to lineitem; self-join mass dominates") {
    val rows = RelationalOps.joinSizeAudit(spark, sfDir).collect()
    val total = Tables(spark, sfDir, "lineitem").count()
    assert(rows.map(_.getLong(2)).sum == total)
    // Σc² ≥ Σc with equality iff every key is unique
    rows.foreach(r => assert(r.getLong(3) >= r.getLong(2)))
    assert(rows.map(_.getLong(3)).sum >= total)
  }

  test("embedding outliers are the true top-20 by exhaustive distance") {
    val got = VectorOps.embeddingOutliers(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(got.length == 20)
    // descending, tie-broken by vec_id
    got.sliding(2).foreach { case Array((ida, da), (idb, db)) =>
      assert(da > db || (da == db && ida < idb))
    }
    // no vector outside the top-20 beats the cutoff (exhaustive check
    // recomputed independently via the same integer quantization)
    val cutoff = got.last._2
    val all = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("dim"),
        floor(col("v").cast("double") * lit(1000000.0)).cast("long").as("vu"))
    val cent = all.groupBy(col("dim"))
      .agg(expr("cast(sum(cast(vu as decimal(38,0))) div count(1) as bigint)")
        .as("mean_u"))
    val better = all.join(broadcast(cent), "dim")
      .groupBy(col("vec_id"))
      .agg(sum(expr("cast(vu - mean_u as decimal(38,0)) * (vu - mean_u)"))
        .cast("long").as("d2"))
      .where(col("d2") > cutoff)
      .count()
    assert(better <= 19, "a non-reported vector exceeds the top-20 cutoff")
  }

  test("event lift: ordered pairs, supports bound the intersection") {
    val rows = EventOps.eventLift(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getLong(2) <= math.min(r.getLong(3), r.getLong(4)))
    }
  }

  test("kanon audit: risk cells and ppm are bounded") {
    val rows = EventOps.kanonAudit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000000L)
    }
  }

  test("source overlap: jaccard bounded by the smaller set") {
    val rows = TextOps.sourceOverlap(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getLong(2) <= math.min(r.getLong(3), r.getLong(4)))
      assert(r.getLong(5) >= 0L && r.getLong(5) <= 1000000L)
    }
  }

  test("zipf fit: every language slopes downward") {
    val rows = TextOps.zipfFit(spark, sfDir).collect()
    assert(rows.length >= 2)
    rows.foreach(r => assert(r.getLong(2) < 0L,
      s"${r.getString(0)} rank-count slope must be negative"))
  }
}
