package graft

import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** The 100 TB window-skew guard (VERDICT r8 item 1's plan assert): no
  * query may sort a corpus-sized frame inside a window partitioned
  * SOLELY on a known low-cardinality key (event_type: 5 values,
  * o_orderpriority: 5, lang: 5, o_orderstatus: 3). Such a window
  * serializes the corpus onto |key| sort tasks — the exact shape the
  * two-phase domain-bucket rank (`TwoPhaseRank`) exists to replace.
  *
  * Mechanical rule: a physical Window node whose partition spec is
  * exactly one attribute named in the low-card set is an offender
  * UNLESS (a) an aggregation sits below it in the plan — an agg
  * bounds the window's input to a grid/vocabulary/per-entity frame
  * (the offsets window over TwoPhaseRank's (key, bucket) counts grid,
  * or a rollup-then-rank, both pass; a rank window directly over the
  * scan fails) — or (b) a WindowGroupLimit sits below it — the
  * Partial-mode group limit prunes to top-k per key inside each map
  * task BEFORE any exchange, so the final per-key sort touches only
  * k·n_partitions rows (q_curation_pipeline's rank ≤ 30 cap).
  * WindowGroupLimit nodes themselves are never offenders: Partial
  * mode sorts each input split locally (parallel regardless of key
  * cardinality) and Final mode sorts the pruned survivors. Checked
  * across the ENTIRE query surface so a future operator can't
  * reintroduce the shape unnoticed. */
class LowCardWindowSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private val lowCardKeys =
    Set("event_type", "o_orderpriority", "lang", "o_orderstatus",
      "l_returnflag", "l_linestatus",
      // r9 widening: documents.source (20 values), embeddings.label
      // (10), the synthesized mime column (3) — same serialization
      // physics, slightly more tasks
      "source", "label", "mime")

  private def isBoundedBelow(p: SparkPlan): Boolean =
    p.find(n => n.isInstanceOf[BaseAggregateExec] ||
      n.isInstanceOf[WindowGroupLimitExec]).isDefined

  private def offenders(p: SparkPlan): Seq[String] = p.collect {
    case w: WindowExec
        if w.partitionSpec.length == 1 &&
          w.partitionSpec.head.isInstanceOf[AttributeReference] &&
          lowCardKeys(w.partitionSpec.head
            .asInstanceOf[AttributeReference].name) &&
          !isBoundedBelow(w.child) =>
      s"Window on ${w.partitionSpec.head.sql}"
    // the degenerate case: NO partition key = ONE sort task for the
    // whole frame — legal only over an agg-bounded grid (r8's manual
    // single-partition audit, now mechanical)
    case w: WindowExec
        if w.partitionSpec.isEmpty && !isBoundedBelow(w.child) =>
      "global Window (no partition key)"
  }

  test("no corpus-sized window partitions solely on a low-card key") {
    // sparkPlan (pre-AQE) keeps the full tree visible without
    // executing 251 queries; window partitioning never changes under
    // AQE re-planning.
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.sparkPlan
        offenders(plan).map(o => s"$name: $o")
    }
    assert(bad.isEmpty,
      s"low-cardinality corpus windows found:\n${bad.mkString("\n")}")
  }
}
