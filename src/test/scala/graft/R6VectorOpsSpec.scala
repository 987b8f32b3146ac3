package graft

import org.apache.spark.sql.functions._
import graft.ops.VectorOps

/** Invariants of the round-6 vector-selection wave (hubness /
  * k-center coreset / MMR) beyond the DuckDB hash gate —
  * scale-independent structural properties plus the two greedy
  * monotonicity laws the operators' usefulness rests on.
  */
class R6VectorOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("hubness distribution is a partition of the corpus and list slots") {
    val rows = VectorOps.hubness(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nVecs = Tables(spark, sfDir, "embeddings").count()
    // every vector lands in exactly one k-occurrence bucket
    assert(rows.map(_._2).sum === nVecs)
    // 100 queries x top-10 = 1000 list slots, each attributed once
    assert(rows.map { case (k, n) => k * n }.sum === 1000L)
    // the j = 0 (anti-hub) row exists by construction
    assert(rows.exists(_._1 === 0L))
  }

  test("k-center coverage cosine is monotone non-decreasing") {
    val picks = VectorOps.kcenterSelect(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(picks.length === 8)
    assert(picks.map(_._2).distinct.length === 8, "centers must be distinct")
    assert(picks.head === ((0L, 0L, 1000000L)), "seed is the lowest id")
    // Gonzalez greedy: each new pick is the farthest remaining point,
    // and adding centers can only move points closer — the selected
    // coverage cosine (closeness of the pick at selection time) is
    // non-decreasing from step 1 on.
    val radii = picks.filter(_._1 >= 1L).sortBy(_._1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => a <= b },
      s"coverage curve must be monotone, got ${radii.mkString(",")}")
  }

  test("MMR picks come from the pool with non-increasing scores") {
    val sel = VectorOps.mmrRerank(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(sel.length === 25) // 5 queries x 5 picks
    sel.groupBy(_._1).foreach { case (qid, picks) =>
      assert(picks.map(_._3).distinct.length === 5,
        s"q$qid: picks must be distinct")
      // shrinking pool + growing max-sim penalty => the achievable
      // MMR score can only fall step over step
      val scores = picks.sortBy(_._2).map(_._4)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"q$qid: scores must be non-increasing, got ${scores.mkString(",")}")
    }
    // step 1 is pure relevance: it must equal the brute-force top-1
    val top1 = graft.ops.LlmOps.cosineTopk(spark, sfDir).collect()
      .filter(r => r.getLong(0) < 5 && r.getLong(1) == 1L)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    sel.filter(_._2 == 1L).foreach { case (qid, _, cid, _) =>
      assert(top1(qid) === cid, s"q$qid: step-1 pick must be the cosine top-1")
    }
  }

  test("quality-vs-dup deciles partition the corpus evenly") {
    val rows = graft.ops.LlmOps.qualityVsDup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(4), r.getLong(5)))
    val nDocs = Tables(spark, sfDir, "documents").count()
    assert(rows.map(_._1).toSeq === (0L to 9L))
    assert(rows.map(_._2).sum === nDocs)
    // rank-based deciles differ by at most 1 in size
    val sizes = rows.map(_._2)
    assert(sizes.max - sizes.min <= 1)
    rows.foreach { case (d, n, nd, qmin, qmax) =>
      assert(nd <= n, s"decile $d: dup count exceeds size")
      assert(qmin <= qmax, s"decile $d: score range inverted")
    }
    // decile score ranges are non-overlapping and ordered
    val byD = rows.sortBy(_._1)
    byD.zip(byD.tail).foreach { case ((d, _, _, _, amax), (_, _, _, bmin, _)) =>
      assert(amax <= bmin, s"decile $d: ranges overlap")
    }
  }

  test("winsorize clips ~5% per tail and shrinks the mean toward center") {
    val rows = graft.ops.EventOps.winsorize(spark, sfDir).collect()
    rows.foreach { r =>
      val (n, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (nLo, nHi) = (r.getLong(4), r.getLong(5))
      assert(lo <= hi, "bounds inverted")
      // strictly-below-p05 / strictly-above-p95 counts are < 5% + ties
      assert(nLo < n * 6 / 100 && nHi < n * 6 / 100,
        s"clip counts implausible: $nLo/$nHi of $n")
      // winsorized mean lies within the clip bounds
      val mw = r.getLong(7)
      assert(mw >= lo && mw <= hi, "winsorized mean outside bounds")
    }
  }

  test("MAD census is robust-consistent per type") {
    val rows = graft.ops.EventOps.madOutliers(spark, sfDir).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val (n, med, mad, nOut, maxDev) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(mad >= 0 && maxDev >= mad, "MAD must be a lower deviation bound")
      // at most half the values can deviate past the median deviation
      assert(nOut <= n / 2, s"outlier count $nOut exceeds half of $n")
      assert(med >= 0, "event values are non-negative micro-units")
    }
  }
}
