package graft

import org.apache.spark.sql.functions._
import graft.ops.{EventOps, LlmOps, TextOps}

/** Invariants of the round-6 tail operators (changepoint / decay /
  * heatmap wave) beyond the DuckDB hash gate — scale-independent
  * properties, plus the one equivalence the whole CUSUM design rests
  * on: the windowed closed form must equal the textbook sequential
  * recurrence.
  */
class R6TailOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("CUSUM closed form equals the sequential recurrence") {
    // Fold the recurrence S_i = max(0, S_{i-1} + dev_i) driver-side
    // per user (with the same n-scaled integer deviations) and
    // compare the max excursion against the query's closed form
    // P_i - min(0, min prefix P). Equality here is the proof the
    // distributed reformulation is the same operator.
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        expr("cast(floor(value * cast(1000000 as double)) as bigint)")
          .as("yu"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = rows.groupBy(_._1).map { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      val n = BigInt(sorted.length)
      val vsum = sorted.map(e => BigInt(e._4)).sum
      var s = BigInt(0); var mx = BigInt(0)
      sorted.foreach { e =>
        s = (s + n * e._4 - vsum).max(BigInt(0))
        mx = mx.max(s)
      }
      u -> (mx / n).toLong
    }
    val got = EventOps.cusumChangepoint(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (u, e) =>
      assert(got(u) == e, s"user $u: closed form ${got(u)} != recurrence $e")
    }
  }

  test("decay scores are bounded by the undecayed mass") {
    // Each event's weight is 2^(-k) <= 1, so the decayed count can
    // never exceed n_events (in milli-units: 1000 * n), and a corpus
    // with any event inside the newest hour keeps a strictly
    // positive score.
    val r = EventOps.decayCounts(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val n = row.getLong(1); val dm = row.getLong(2)
      assert(dm <= 1000L * n, s"user ${row.getLong(0)}: $dm > ${1000 * n}")
      assert(dm >= 0L)
    }
    assert(r.exists(_.getLong(2) > 0L), "all scores decayed to zero")
  }

  test("heatmap marginals are consistent and lift averages to ~1") {
    // Cell counts must re-sum to the corpus total, and the
    // count-weighted mean lift equals 1 exactly when rows and
    // columns are independent — on real data it stays near 1e6 ppm
    // (it is a weighted average of observed/expected ratios).
    val cells = EventOps.eventHeatmap(spark, sfDir).collect()
    val total = Tables.events(spark, sfDir).count()
    assert(cells.map(_.getLong(2)).sum == total)
    val wmean = cells.map(r => r.getLong(2).toDouble * r.getLong(3)).sum /
      total.toDouble
    assert(wmean > 900000.0 && wmean < 1200000.0,
      s"count-weighted mean lift $wmean far from 1e6 ppm")
    cells.foreach(r => assert(r.getLong(3) > 0L))
  }

  test("perplexity filter separates the reference domain") {
    // The operator's reason to exist: documents from the training
    // domain (en) must score a lower mean NLL under the en-trained
    // LM than documents outside it. If this inversion ever fails,
    // the filter is mis-trained (e.g., scoring with unsmoothed
    // counts or the wrong reference slice).
    val langs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"))
    val scored = TextOps.docPerplexity(spark, sfDir)
      .join(langs, "doc_id")
      .groupBy(col("lang") === "en")
      .agg(avg(col("avg_nll_micro")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(scored(true) < scored(false),
      s"en mean NLL ${scored(true)} not below non-en ${scored(false)}")
  }

  test("MI totals respect the information inequality up to quantization") {
    // True MI is >= 0; each cell contribution is floored to
    // micro-nats, so a feature's total can undershoot by at most
    // n_cells micro-nats. Anything below that bound means the
    // marginals are wrong.
    val r = TextOps.featureMi(spark, sfDir).collect()
    assert(r.length == 3)
    r.foreach { row =>
      assert(row.getLong(2) >= -row.getLong(1),
        s"${row.getString(0)}: MI ${row.getLong(2)} below -n_cells bound")
    }
  }

  test("common-neighbor mass equals three times the triangle count") {
    // Each triangle {a,b,c} contributes c as a common neighbor of
    // edge (a,b), a of (b,c), and b of (a,c) — and every common
    // neighbor of an edge closes a triangle. So the per-edge common
    // counts must sum to exactly 3 * n_triangles from
    // q_triangle_count: two independently-implemented operators
    // cross-check each other.
    val commonSum = LlmOps.commonNeighbors(spark, sfDir)
      .agg(sum(col("common"))).collect()(0).getLong(0)
    val triangles = LlmOps.triangleCount(spark, sfDir)
      .collect()(0).getAs[Long]("n_triangles")
    assert(commonSum == 3L * triangles,
      s"sum(common) $commonSum != 3 * $triangles triangles")
    // and the Jaccard is a ppm: bounded by construction
    LlmOps.commonNeighbors(spark, sfDir).collect().foreach { r =>
      val j = r.getLong(5)
      assert(j >= 0L && j <= 1000000L, s"jaccard ppm $j out of range")
    }
  }

  test("embedding profile covers every dimension with sane moments") {
    val dims = Tables(spark, sfDir, "embeddings")
      .select(size(col("embedding"))).distinct().collect()
    assert(dims.length == 1)
    val d = dims(0).getInt(0)
    val n = Tables(spark, sfDir, "embeddings").count()
    val rows = graft.ops.VectorOps.embeddingStats(spark, sfDir).collect()
    assert(rows.length == d)
    rows.foreach { r =>
      assert(r.getLong(1) == n)
      val (mean, varU2, min, max) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(varU2 >= 0L, s"dim ${r.getLong(0)}: negative variance")
      assert(min <= mean && mean <= max,
        s"dim ${r.getLong(0)}: mean $mean outside [$min, $max]")
    }
  }

  test("skipping audit reproduces the layout trade-off story") {
    // The reason the operator exists: a single-column sort is blind
    // off its sort key (y-slab scans EVERYTHING), z-order prunes on
    // both dims, and the x-sort stays at-or-better on pure-x slabs.
    // (relative claims only: at tiny SF sparse files can have
    // partial y-ranges, so the "x-sort scans 100% on a y slab"
    // absolute only appears at density — observed 1000000 ppm at
    // sf0.1, 758000 ppm at sf0.001)
    val r = graft.ops.RelationalOps.skippingAudit(spark, sfDir).collect()
      .map(row => (row.getString(0), row.getString(1)) ->
        (row.getLong(3), row.getLong(5))).toMap
    assert(r(("y_slab", "xsort"))._2 > 2L * r(("y_slab", "zorder"))._2,
      "z-order should prune a y slab far better than the x-sort")
    assert(r(("xy_box", "zorder"))._1 <= r(("xy_box", "xsort"))._1,
      "z-order should scan no more files than x-sort on a 2-D box")
    assert(r(("x_slab", "xsort"))._1 <= r(("x_slab", "zorder"))._1,
      "x-sort should be at-or-better on its own sort key")
  }

  test("rebalanced classes are exactly min-class-sized") {
    val langCounts = Tables(spark, sfDir, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val target = langCounts.values.min
    val kept = LlmOps.classRebalance(spark, sfDir).collect()
    val keptByLang = kept.groupBy(_.getString(0)).view.mapValues(_.length)
    assert(keptByLang.toMap.values.toSet == Set(target.toInt),
      s"per-class kept sizes ${keptByLang.toMap} != min class $target")
    // ranks are 1..target with no gaps in every class
    kept.groupBy(_.getString(0)).foreach { case (l, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq ==
        (1L to target).toSeq, s"rank gap in class $l")
    }
  }
}
