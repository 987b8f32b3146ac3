package graft

import org.apache.spark.sql.DataFrame
import graft.ops.LlmOps

/** Measures the graph family's standing-ceiling claim (README "Known
  * ceilings"): per the oracle contract each graph query re-derives the
  * LSH candidate-pair frame in-plan, but a 100 TB deployment derives
  * it ONCE per corpus snapshot and runs every analysis against the
  * materialized frame. This spec demonstrates that shape session-
  * scoped — [[LlmOps.candidateFrame]] (localCheckpoint on gate runs) —
  * and pins:
  *   1. answer identity: triangles / degree histogram / common-
  *      neighbor scores from the shared frame equal the re-deriving
  *      per-query operators row for row;
  *   2. the shared-frame plans contain NO parquet scan — the LSH
  *      banding (shingle sha + band join over documents) is gone from
  *      every downstream plan;
  *   3. measured wall-clock: 1 derivation + 3 analyses beats 3
  *      derivations (numbers in the test output; the margin is the
  *      2 skipped LSH derivations, which dominate at sf0.01).
  */
class SharedCandidateFrameSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("shared candidate frame: identical answers, no rescan, measured saving") {
    // per-query path: each operator re-derives the LSH pairs in-plan
    val (tri1, tTri1) = timed(rows(LlmOps.triangleCount(spark, dir)))
    val (deg1, tDeg1) = timed(rows(LlmOps.dedupDegree(spark, dir)))
    val (cn1, tCn1) = timed(rows(LlmOps.commonNeighbors(spark, dir)))
    val rederived = tTri1 + tDeg1 + tCn1

    // shared path: ONE derivation, three analyses off the checkpoint
    val (frame, tDerive) = timed {
      val f = LlmOps.candidateFrame(spark, dir)
      f.count() // force materialization inside the timed derivation
      f
    }
    val triShared = LlmOps.triangleStats(
      frame.select(frame("doc_a").as("u"), frame("doc_b").as("v")))
    val degShared = LlmOps.dedupDegreeOf(frame)
    val cnShared = LlmOps.commonNeighborsOf(frame)
    val (tri2, tTri2) = timed(rows(triShared))
    val (deg2, tDeg2) = timed(rows(degShared))
    val (cn2, tCn2) = timed(rows(cnShared))
    val shared = tDerive + tTri2 + tDeg2 + tCn2

    // 1. answer identity
    assert(tri2 == tri1)
    assert(deg2 == deg1)
    assert(cn2 == cn1)

    // 2. no parquet rescan below the shared frame: the checkpointed
    // RDD replaces the whole LSH derivation in every downstream plan
    Seq(triShared, degShared, cnShared).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.toLowerCase.contains("parquet"),
        s"shared-frame plan still scans parquet:\n$plan")
      assert(plan.contains("ExistingRDD"), "checkpoint scan missing")
    }

    // 3. measured saving (recorded for the README ceiling paragraph)
    info(f"re-deriving: triangles $tTri1%.2f s + degree $tDeg1%.2f s + " +
      f"common-neighbors $tCn1%.2f s = $rederived%.2f s")
    info(f"shared: derive-once $tDerive%.2f s + analyses " +
      f"${tTri2 + tDeg2 + tCn2}%.2f s = $shared%.2f s " +
      f"(${100 * (1 - shared / rederived)}%.0f%% saved)")
    assert(shared < rederived,
      f"shared $shared%.2f s not below re-deriving $rederived%.2f s")
  }

  test("spark.graft.dedup.materialize gates the standing frame " +
    "across the graph family with identical answers") {
    // the queries-map entries the conf affects (the README ceiling's
    // graph family + quality_vs_dup's membership probe)
    val family = Seq("q_dedup_clusters", "q_cluster_stats",
      "q_dedup_pagerank", "q_triangle_count", "q_recursive_reach",
      "q_dedup_consensus", "q_common_neighbors", "q_dedup_degree",
      "q_clustering_coeff", "q_quality_vs_dup")
    def run(name: String): (Seq[String], Double) = {
      val t0 = System.nanoTime()
      val r = rows(SparkEntry.queries(name)(spark, dir))
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val off = family.map(n => n -> run(n)).toMap
    spark.conf.set("spark.graft.dedup.materialize", "true")
    try {
      val on = family.map(n => n -> run(n)).toMap
      family.foreach { n =>
        assert(on(n)._1 == off(n)._1, s"$n differs under materialize")
      }
      val tOff = off.values.map(_._2).sum
      val tOn = on.values.map(_._2).sum
      family.foreach { n =>
        info(f"$n%-22s off=${off(n)._2}%5.2f s  on=${on(n)._2}%5.2f s")
      }
      info(f"family total: off=$tOff%.2f s on=$tOn%.2f s " +
        f"(${100 * (1 - tOn / tOff)}%.0f%% saved; 'on' includes the " +
        "one-time derivation inside the first query)")
      // ten queries, one derivation: the standing frame must win
      assert(tOn < tOff,
        f"standing frame $tOn%.2f s not below re-deriving $tOff%.2f s")
    } finally spark.conf.unset("spark.graft.dedup.materialize")
  }
}
