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
  * flap is noise, a 2 → 5 s move is a plan change). Deliberate
  * scale trades go in [[allowlist]] WITH the reason — the gate's
  * point is that a regression is either explained in a committed
  * note or fails CI, never silent. */
class BenchRegressionSpec extends AnyFunSuite {

  /** query -> committed reason for an accepted >2× local cost.
    * (q_sequence_pack's r9 1.44× two-phase trade sits below this
    * gate's 2× threshold — entries here are for bigger, deliberate
    * moves.) */
  private val allowlist: Map[String, String] = Map.empty

  private val QueriesRe = """"queries":\{([^}]*)\}""".r
  private val EntryRe = """"(q_[a-z0-9_]+)":([0-9.]+)""".r

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
    val cur = medians("BENCH_full_latest.json")
    assert(prev.size > 200 && cur.size > 200,
      s"artifact parse too small: ${prev.size} / ${cur.size}")

    val regressed = prev.keySet.intersect(cur.keySet).toSeq.sorted.flatMap {
      k =>
        val (o, n) = (prev(k), cur(k))
        if (o > 0 && n / o > 2.0 && n - o > 0.5 && !allowlist.contains(k))
          Some(f"$k: $o%.3fs -> $n%.3fs (${n / o}%.2fx)")
        else None
    }
    assert(regressed.isEmpty,
      s"unexplained regressions vs $prevPath (add to allowlist WITH a " +
        s"reason, or fix):\n${regressed.mkString("\n")}")

    // coverage must not silently shrink: every previously-benched
    // query still benches (removals need a survey-level decision,
    // which would update the artifacts together)
    val removed = prev.keySet -- cur.keySet
    assert(removed.isEmpty,
      s"queries dropped from the bench: ${removed.toSeq.sorted.mkString(", ")}")
  }
}
