package graft

import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The 100 TB window-skew guard (VERDICT r8 item 1's plan assert): no
  * query may sort a corpus-sized frame inside a window partitioned
  * solely on known low-cardinality keys (event_type: 5 values,
  * o_orderpriority: 5, lang: 5, o_orderstatus: 3, …). Such a window
  * serializes the corpus onto |keys| sort tasks — the exact shape the
  * two-phase domain-bucket rank (`TwoPhaseRank`) exists to replace.
  *
  * Mechanical rule (r10 revision closing two r9 loopholes): a
  * physical Window node is an offender when EVERY attribute in its
  * partition spec is a named low-card key AND the PRODUCT of their
  * cardinalities is under `MaxProductCard` (a `(lang, source)` spec
  * is 5 × 20 = 100 sort tasks at 100 TB — still serialized; one
  * plentiful-key attribute anywhere in the spec makes the grain
  * uniform), UNLESS the window's input is bounded below it on EVERY
  * data path: each leaf-to-window path must cross an aggregation
  * (bounds the frame to a grid/vocabulary/per-entity set — the
  * offsets window over TwoPhaseRank's (key, bucket) counts grid
  * passes) or a WindowGroupLimit (Partial-mode top-k prune before
  * the exchange, q_curation_pipeline's rank ≤ 30 cap). An agg merely
  * SOMEWHERE in the subtree is not enough: a corpus-sized stream
  * joined against an aggregated broadcast dim still sorts the corpus
  * (the r9 `find()`-anywhere loophole). WindowGroupLimit nodes
  * themselves are never offenders: Partial mode sorts each input
  * split locally (parallel regardless of key cardinality) and Final
  * mode sorts the pruned survivors. Checked across the ENTIRE query
  * surface so a future operator can't reintroduce the shape
  * unnoticed. */
class LowCardWindowSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Known low-card keys and their (testdata-pinned) cardinalities.
    * r9 widening: documents.source (20), embeddings.label (10), the
    * synthesized mime column (3) — same serialization physics. */
  private val lowCardKeys = Map(
    "event_type" -> 5L, "o_orderpriority" -> 5L, "lang" -> 5L,
    "o_orderstatus" -> 3L, "l_returnflag" -> 3L, "l_linestatus" -> 2L,
    "source" -> 20L, "label" -> 10L, "mime" -> 3L)

  /** A spec of ONLY low-card keys below this product is a serialized
    * sort at 100 TB ((lang, source) = 100 tasks ≪ a 1000-executor
    * cluster); above it the combination grain is ruled wide enough. */
  private val MaxProductCard = 200L

  /** True iff EVERY leaf-to-`p` path crosses a frame-bounding node
    * (aggregation or WindowGroupLimit). A bounding node terminates
    * its branch; any leaf reached without one is an unbounded path —
    * so a corpus scan joined to an aggregated broadcast side does NOT
    * pass (the agg bounds only the dim branch). */
  private def boundedOnAllPaths(p: SparkPlan): Boolean = p match {
    case _: BaseAggregateExec | _: WindowGroupLimitExec => true
    case leaf if leaf.children.isEmpty => false
    case other => other.children.forall(boundedOnAllPaths)
  }

  private def offenders(p: SparkPlan): Seq[String] = p.collect {
    case w: WindowExec
        if w.partitionSpec.nonEmpty &&
          w.partitionSpec.forall(e =>
            e.isInstanceOf[AttributeReference] &&
              lowCardKeys.contains(
                e.asInstanceOf[AttributeReference].name)) &&
          w.partitionSpec.map(e =>
            lowCardKeys(e.asInstanceOf[AttributeReference].name))
            .product < MaxProductCard &&
          !boundedOnAllPaths(w.child) =>
      s"Window on ${w.partitionSpec.map(_.sql).mkString("(", ", ", ")")}"
    // the degenerate case: NO partition key = ONE sort task for the
    // whole frame — legal only over an agg-bounded grid (r8's manual
    // single-partition audit, now mechanical)
    case w: WindowExec
        if w.partitionSpec.isEmpty && !boundedOnAllPaths(w.child) =>
      "global Window (no partition key)"
  }

  test("no corpus-sized window partitions solely on low-card keys") {
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

  test("guard flags a multi-attribute low-card corpus window") {
    // The r9 predicate required partitionSpec.length == 1, so a
    // (lang, source) window — 100 combos, 100 serialized sort tasks
    // at 100 TB — passed silently. Plant exactly that shape and
    // require the guard to flag it.
    val docs = Tables(spark, sf, "documents")
    val w = Window.partitionBy(col("lang"), col("source"))
      .orderBy(col("doc_id"))
    val planted = docs.select(col("doc_id"), col("lang"), col("source"),
      row_number().over(w).as("r"))
    val found = offenders(planted.queryExecution.sparkPlan)
    assert(found.nonEmpty,
      "multi-attribute low-card window passed the guard")
  }

  test("guard flags a corpus window joined to an aggregated dim") {
    // The r9 isBoundedBelow excused a window if ANY agg appeared
    // anywhere in its subtree — including on the far side of a join.
    // Plant a corpus-sized events frame joined to an aggregated
    // per-type dim, windowed on event_type: the corpus path crosses
    // no agg, so the guard must flag it.
    val ev = Tables.events(spark, sf)
    val dim = ev.groupBy(col("event_type"))
      .agg(avg(col("value")).as("type_avg"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts_us"))
    val planted = ev.join(broadcast(dim), "event_type")
      .select(col("event_id"), col("event_type"),
        row_number().over(w).as("r"))
    val found = offenders(planted.queryExecution.sparkPlan)
    assert(found.nonEmpty,
      "corpus window with an agg only on the dim branch passed the guard")
  }

  test("guard still passes agg-bounded and group-limited shapes") {
    val ev = Tables.events(spark, sf)
    // agg below the window on the ONLY data path: the grid shape
    val grid = ev.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("n"))
    val bounded = grid.select(col("event_type"),
      row_number().over(w).as("r"))
    assert(offenders(bounded.queryExecution.sparkPlan).isEmpty,
      "agg-bounded low-card window was wrongly flagged")
    // plentiful key present in the spec: uniform grain, never flagged
    val w2 = Window.partitionBy(col("event_type"), col("user_id"))
      .orderBy(col("ts_us"))
    val mixed = ev.select(col("event_id"),
      row_number().over(w2).as("r"))
    assert(offenders(mixed.queryExecution.sparkPlan).isEmpty,
      "window including a plentiful key was wrongly flagged")
  }
}
