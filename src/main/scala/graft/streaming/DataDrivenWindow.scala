package graft.streaming

import scala.util.Try

/** Exact replay of the reference's data-driven windowing semantics
  * (/root/reference/src/DispatcherFunction/DispatcherFunction.cs),
  * shared by the batch compat operator (CompatOps, flatMapGroups) and
  * the Structured Streaming wrapper (StreamingCompat,
  * flatMapGroupsWithState) so the two paths cannot drift apart.
  *
  * The processing unit is a BATCH (one ProcessPlayerAsync call,
  * cs:66-105): scan the batch advancing the window start, enqueue the
  * whole batch, then run AT MOST ONE drain (pushTime is a bool — three
  * boundary crossings in one batch still drain once, cs:84-104).
  * Output therefore depends on how the stream was batched, exactly as
  * it does in the reference; the split-equivalence property in
  * WindowPropertySpec shows output is a pure fold over the batch
  * sequence.
  *
  * Reproduced quirks — deliberately NOT "fixed", they are the
  * reference's defining behavior (SURVEY.md §7.4):
  *  - window start = first-seen event's ts, advanced to the ts of each
  *    event ≥ current start+1s (cs:74-94) — data-driven, not aligned;
  *  - boundary check is `>= 1` second (cs:87);
  *  - the drain is add-then-check: the first out-of-window event is
  *    consumed INTO the closing window and lost to the next
  *    (cs:130-137);
  *  - UNDERFLOW: because that consumption makes the queue head drift
  *    ahead of the start key, a later drain can exhaust the queue
  *    before spanning a second — the reference logs "We've run out of
  *    queue and lost some messages!" and throws (cs:123-127), with the
  *    popped events destructively lost (LPOP). We model the platform's
  *    view of that crash: the drained events are lost, nothing is
  *    emitted, processing continues with the advanced start — the data
  *    loss is preserved, the exception is contained;
  *  - the final partial window never emits (no timer close);
  *  - output schema is first-row-wins: field count and names come from
  *    the window's first event; a later event with fewer values throws
  *    (cs:141-149);
  *  - value parse failure contributes 0, not null/skip (cs:164-170);
  *  - averages are decimal and re-stringified (cs:148).
  */
object DataDrivenWindow {

  val WindowUs: Long = 1000000L // 1 second, cs:87

  /** Canonical event envelope (DataPoint.cs:8-28; ts in epoch µs). */
  case class CompatPoint(
      key: String, tsUs: Long, seq: Long, deviceId: String,
      sessionId: String, names: Seq[String], values: Seq[String])

  /** One emitted window row (anonymous object at cs:152-159), with the
    * allvalues map flattened to parallel name/value seqs in first-row
    * field order. */
  case class CompatRow(
      key: String, tsUs: Long, deviceId: String, sessionId: String,
      sessionStart: String, names: Seq[String], avgValues: Seq[String])

  /** Per-key state: current window start (cs startKey) + pending
    * buffer (cs queueKey). */
  case class KeyState(startUs: Option[Long], queue: Vector[CompatPoint])

  val emptyState: KeyState = KeyState(None, Vector.empty)

  /** decimal.TryParse-else-0 (cs:164-170). */
  def parse0(s: String): BigDecimal =
    Try(BigDecimal(s.trim)).getOrElse(BigDecimal(0))

  /** Per-field decimal average over the buffer, first-row-wins schema
    * (cs:141-150). Throws if a later event has fewer fields — the
    * reference's IndexOutOfRange behavior. */
  def aggregate(buffer: Vector[CompatPoint]): CompatRow = {
    val first = buffer.head
    val n = first.values.length // count from FIRST event, cs:142
    val pairs = (0 until n).map { i =>
      val avg = buffer.iterator.map(p => parse0(p.values(i)))
        .foldLeft(BigDecimal(0))(_ + _) / buffer.length
      (first.names(i), avg.underlying.stripTrailingZeros.toPlainString)
    }
    CompatRow(first.key, first.tsUs, first.deviceId, first.sessionId,
      sessionStart = "", // always empty, cs:157
      names = pairs.map(_._1), avgValues = pairs.map(_._2))
  }

  /** One drain pass (PushTimeAsync, cs:107-162): pop from the queue
    * head until the first event ≥ drain-start+1s has been CONSUMED
    * (add-then-check, cs:130-137). Left(lostCount) = underflow: the
    * queue exhausted before spanning a second — all popped events are
    * destructively lost (cs:121-127). */
  def drainOnce(queue: Vector[CompatPoint]): Either[Int, (CompatRow, Vector[CompatPoint])] = {
    if (queue.isEmpty) return Left(0)
    val drainStart = queue.head.tsUs // cs:130
    val boundaryIdx = queue.indexWhere(p => p.tsUs - drainStart >= WindowUs)
    if (boundaryIdx < 0) Left(queue.length) // underflow: everything popped+lost
    else {
      val (window, rest) = queue.splitAt(boundaryIdx + 1) // boundary consumed
      Right((aggregate(window), rest))
    }
  }

  /** One ProcessPlayerAsync call (cs:66-105) over one batch, which the
    * reference requires to be in event-time order (it sorts each batch
    * globally before demux, cs:35). Returns the next state plus either
    * the single emitted row, or None (no boundary crossed, or
    * underflow loss). */
  def processBatch(state: KeyState, batch: Seq[CompatPoint]): (KeyState, Option[CompatRow]) = {
    if (batch.isEmpty) return (state, None)
    var startUs = state.startUs.getOrElse(batch.head.tsUs) // init-on-first, cs:76-80
    var pushTime = false
    batch.foreach { px => // boundary scan, cs:84-94
      if (px.tsUs - startUs >= WindowUs) {
        startUs = px.tsUs // advance start, cs:90-92
        pushTime = true
      }
    }
    val queue = state.queue ++ batch // enqueue whole batch, cs:97
    if (!pushTime) (KeyState(Some(startUs), queue), None)
    else drainOnce(queue) match { // exactly one drain per batch, cs:99-104
      case Right((row, rest)) => (KeyState(Some(startUs), rest), Some(row))
      case Left(_) => (KeyState(Some(startUs), Vector.empty), None) // lost
    }
  }

  /** Fold a batch sequence through processBatch. */
  def replay(state: KeyState, batches: Iterator[Seq[CompatPoint]]): (KeyState, Vector[CompatRow]) =
    batches.foldLeft((state, Vector.empty[CompatRow])) {
      case ((st, acc), batch) =>
        val (next, row) = processBatch(st, batch)
        (next, acc ++ row)
    }
}
