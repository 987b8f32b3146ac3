package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Bench regression gate (VERDICT r9 item 5): the r9 prose rule —
  * "compare the committed previous full-bench artifact to the fresh
  * run, explain every big mover" — promoted to a failing test. Pure
  * JSON arithmetic over committed artifacts (no Spark, no bench run
  * in-suite): the newest `BENCH_full_r<N>.json` is the previous
  * round's record, `BENCH_full_latest.json` is the current state
  * (regenerated each round's close, committed with it).
  *
  * Guardbands against the documented ±15–30 % box variance: a query
  * fails only when it got MORE THAN 2× slower AND the absolute move
  * exceeds 0.5 s (sub-second queries jitter across JVMs; a 0.1 → .25 s
  * flap is noise, a 2 → 5 s move is a plan change) — and, since the
  * r14 second wave, only when even its BEST raw run clears the band
  * (one transient load window per full run inflates an alphabetical
  * BLOCK of medians 2–3×; a genuine plan regression slows every run,
  * noise spares at least one). Deliberate scale trades go in
  * [[allowlist]] WITH the reason — the gate's point is that a
  * regression is either explained in a committed note or fails CI,
  * never silent.
  *
  * Artifact-comparability contract (VERDICT r13 item 1):
  * `BENCH_full_latest.json` is gitignored and DRIVER-OWNED — after a
  * round closes the driver (or judge) may rewrite it as a loaded-box
  * full run or a targeted few-query re-bench, neither of which is a
  * statement about this code state. Comparing against such an
  * artifact produced the r13 false alarm (q_props_schema "45.3 s" on
  * a load-4 box; 1.07 s quiet). So the comparison only RUNS when the
  * latest artifact is actually comparable: full coverage (> 200
  * queries — a subset file is a targeted probe, not a suite record)
  * and both artifacts recorded a quiet box at run start
  * (`env.load_start` ≤ [[maxComparableLoad]] — bench numbers taken
  * while other JVMs saturate the 32 cores measure the box, not the
  * plan). An incomparable artifact CANCELS with the exact
  * regeneration command; a missing one likewise (fresh clone). The
  * committed `BENCH_full_r<N>.json` chain remains the durable
  * regression record either way — each round regenerates `latest` on
  * a quiet box and adjudicates movers in `BENCH_DIFF_r<N>.txt`. */
class BenchRegressionSpec extends AnyFunSuite {

  /** query -> committed reason for an accepted >2× local cost.
    * (q_sequence_pack's r9 1.44× two-phase trade sits below this
    * gate's 2× threshold — entries here are for bigger, deliberate
    * moves.) */
  private val allowlist: Map[String, String] = Map.empty

  /** 1-min loadavg at bench start above which numbers measure the
    * shared box, not the plan (r13's false alarm recorded 4.03; clean
    * runs on this box record 0.3–1.7 with two resident JVMs). */
  private val maxComparableLoad = 2.5

  private val QueriesRe = """"queries":\{([^}]*)\}""".r
  private val EntryRe = """"(q_[a-z0-9_]+)":([0-9.]+)""".r
  private val LoadRe = """"load_start":(-?[0-9.]+)""".r
  private val RunsRe = """"runs":\{([^}]*)\}""".r
  private val RunsEntryRe = """"(q_[a-z0-9_]+)":\[([0-9.,]*)\]""".r

  /** Per-query BEST run from the artifact's raw `runs` arrays (empty
    * map for artifacts predating the runs field). */
  private def bestRuns(path: String): Map[String, Double] = {
    val body = Files.readString(Paths.get(path))
    RunsRe.findFirstMatchIn(body).map(_.group(1)) match {
      case None => Map.empty
      case Some(block) =>
        RunsEntryRe.findAllMatchIn(block).flatMap { m =>
          val vs = m.group(2).split(',').filter(_.nonEmpty).map(_.toDouble)
          if (vs.isEmpty) None else Some(m.group(1) -> vs.min)
        }.toMap
    }
  }

  private def loadStart(path: String): Double =
    LoadRe.findFirstMatchIn(Files.readString(Paths.get(path)))
      .map(_.group(1).toDouble).getOrElse(-1.0)

  private val regenCmd =
    "SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch " +
      "\"runMain graft.Bench\" | tail -1 > BENCH_full_latest.json " +
      "(quiet box: 1-min load < 2.5)"

  private def medians(path: String): Map[String, Double] = {
    val body = Files.readString(Paths.get(path))
    val qblock = QueriesRe.findFirstMatchIn(body)
      .getOrElse(fail(s"$path has no queries map")).group(1)
    EntryRe.findAllMatchIn(qblock)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  private def previousArtifact: String = {
    val re = """BENCH_full_r(\d+)\.json""".r
    val all = Files.list(Paths.get(".")).toArray
      .map(_.toString.stripPrefix("./"))
      .collect { case s @ re(n) => (n.toInt, s) }
    assert(all.nonEmpty, "no committed BENCH_full_r<N>.json artifact")
    all.maxBy(_._1)._2
  }

  test("no unexplained >2x per-query regression vs the previous round") {
    val prevPath = previousArtifact
    val prev = medians(prevPath)
    assert(prev.size > 200, s"$prevPath parse too small: ${prev.size}")

    val latestPath = "BENCH_full_latest.json"
    assume(Files.exists(Paths.get(latestPath)),
      s"$latestPath absent (gitignored, driver-owned) — regenerate: $regenCmd")
    val cur = medians(latestPath)
    assume(cur.size > 200,
      s"$latestPath covers only ${cur.size} queries — a targeted re-bench, " +
        s"not a full-suite record; regenerate: $regenCmd")
    val (prevLoad, curLoad) = (loadStart(prevPath), loadStart(latestPath))
    assume(curLoad <= maxComparableLoad && prevLoad <= maxComparableLoad,
      f"artifacts not load-comparable (env.load_start: $prevPath " +
        f"$prevLoad%.2f, $latestPath $curLoad%.2f, bar $maxComparableLoad) — " +
        s"a loaded-box artifact measures the box, not the plan; " +
        s"regenerate: $regenCmd")

    // Board-drift normalization (r14): the shared box's speed moves
    // between rounds as a whole — r14 measured a uniform 1.43× median
    // slowdown across all 251 queries on a provably byte-identical
    // query path (git diff of ops/functions/plans/SparkEntry/Bench
    // empty since the r13 artifact). A per-query canary must detect a
    // query moving AGAINST the board (a plan change), not the board
    // itself, so ratios are normalized by the run-pair's MEDIAN ratio
    // before the 2× band. The median needs enough mass to be the
    // board and not the movers — below 50 common queries no
    // normalization is applied.
    val common = prev.keySet.intersect(cur.keySet).toSeq.sorted
    val ratios = common.collect { case k if prev(k) > 0 => cur(k) / prev(k) }
    val drift =
      if (ratios.size < 50) 1.0
      else ratios.sorted.apply(ratios.size / 2)
    // Best-run screen (r14 second wave): with n_runs=3 medians, ONE
    // transient load window per full run inflates whatever
    // alphabetical block it sweeps 2–3× (observed three times in one
    // day, a DIFFERENT consecutive block each run, every query
    // reverting under an isolated 5-run probe). A real plan
    // regression slows EVERY run; noise spares at least one — so a
    // query fails only when even its BEST latest run clears the
    // normalized 2× band. Artifacts without raw runs fall back to the
    // median alone.
    val best = bestRuns(latestPath)
    val regressed = common.flatMap { k =>
      val (o, n) = (prev(k), cur(k))
      val nBest = best.getOrElse(k, n)
      if (o > 0 && (n / o) / drift > 2.0 && n - o > 0.5 &&
          (nBest / o) / drift > 2.0 && nBest - o > 0.5 &&
          !allowlist.contains(k))
        Some(f"$k: $o%.3fs -> $n%.3fs median, $nBest%.3fs best run " +
          f"(${n / o}%.2fx raw, ${(n / o) / drift}%.2fx vs board drift " +
          f"$drift%.2fx; best-run ${(nBest / o) / drift}%.2fx)")
      else None
    }
    assert(regressed.isEmpty,
      s"unexplained regressions vs $prevPath (board drift " +
        f"$drift%.2fx already normalized out; add to allowlist WITH a " +
        s"reason, or fix):\n${regressed.mkString("\n")}")

    // coverage must not silently shrink: every previously-benched
    // query still benches (removals need a survey-level decision,
    // which would update the artifacts together)
    val removed = prev.keySet -- cur.keySet
    assert(removed.isEmpty,
      s"queries dropped from the bench: ${removed.toSeq.sorted.mkString(", ")}")
  }
}
