package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.DataDrivenWindow
import graft.streaming.DataDrivenWindow._

/** Hand fixtures for the reference's data-driven window quirks
  * (FIXTURES.md §A; citations into
  * /root/reference/src/DispatcherFunction/DispatcherFunction.cs).
  * These are the behaviors a SQL oracle cannot express — each test
  * pins one quirk so a refactor can't silently "fix" it. */
class CompatWindowSpec extends AnyFunSuite {

  private def pt(tsUs: Long, seq: Long, values: Seq[String],
                 names: Seq[String] = Seq("v"), key: String = "k"): CompatPoint =
    CompatPoint(key, tsUs, seq, "dev", "sess", names, values)

  private def run(batches: Seq[Seq[CompatPoint]]): Vector[CompatRow] =
    DataDrivenWindow.replay(emptyState, batches.iterator)._2

  test("10 Hz stream over 3.5 s in ~1.2 s batches: 3 drifting data-driven windows, tail never emits") {
    // batch boundaries at 1.3 s and 2.6 s; events every 100 ms
    val all = (0 to 35).map(i => pt(i * 100000L, i.toLong, Seq("1")))
    val batches = Seq(all.filter(_.tsUs <= 1200000L),
      all.filter(p => p.tsUs >= 1300000L && p.tsUs <= 2500000L),
      all.filter(_.tsUs >= 2600000L))
    val rows = run(batches)
    assert(rows.length == 3)
    // starts drift: 0, then 1.1 (boundary 1.0 was consumed into w1),
    // then 2.2 — data-driven, not aligned to wall-clock seconds
    assert(rows.map(_.tsUs) == Vector(0L, 1100000L, 2200000L))
    // final events (3.3-3.5 s) remain queued forever: no timer close
    val st = DataDrivenWindow.replay(emptyState, batches.iterator)._1
    assert(st.queue.map(_.tsUs) == Vector(3300000L, 3400000L, 3500000L))
  }

  test("pushTime is a bool: 3 boundary crossings in ONE batch still drain once (cs:84-104)") {
    val all = (0 to 35).map(i => pt(i * 100000L, i.toLong, Seq("1")))
    val (st, rows) = DataDrivenWindow.replay(emptyState, Iterator(all))
    assert(rows.length == 1) // one drain despite start advancing 0→1.0→2.0→3.0
    assert(rows.head.tsUs == 0L)
    assert(st.startUs.contains(3000000L))
    assert(st.queue.head.tsUs == 1100000L) // everything after w1 still queued
  }

  test("event-per-batch delivery hits the reference's underflow data loss (cs:121-127)") {
    // 100 Hz continuous: after w1 consumes boundary t=1.00, the queue
    // head (1.01) drifts ahead of start (1.00); when t=2.00 triggers
    // the next drain, no queued event reaches 1.01+1s → queue runs
    // out: "We've run out of queue and lost some messages!"
    val batches = (0 until 350).map(i => Seq(pt(i * 10000L, i.toLong, Seq("1"))))
    val (st, rows) = DataDrivenWindow.replay(emptyState, batches.iterator)
    assert(rows.length == 1) // only the first window survives
    assert(rows.head.tsUs == 0L)
    // windows 2 and 3 were destructively lost, their events popped
    assert(st.queue.forall(_.tsUs > 3000000L))
  }

  test("boundary is >= 1s: event exactly at start+1s closes the window (cs:87)") {
    val rows = run(Seq(Seq(pt(0L, 0, Seq("2")), pt(1000000L, 1, Seq("4")))))
    assert(rows.length == 1)
    // add-then-check: the boundary event is in the closing window
    assert(rows.head.avgValues == Seq("3"))
  }

  test("event just under start+1s does not close a window") {
    assert(run(Seq(Seq(pt(0L, 0, Seq("2")), pt(999999L, 1, Seq("4"))))).isEmpty)
  }

  test("add-then-check drain consumes the first out-of-window event (cs:130-137)") {
    val rows = run(Seq(
      Seq(pt(0L, 0, Seq("10")), pt(500000L, 1, Seq("20")), pt(1200000L, 2, Seq("30"))),
      Seq(pt(1500000L, 3, Seq("40")), pt(2500000L, 4, Seq("50")))))
    assert(rows.length == 2)
    assert(rows(0).tsUs == 0L && rows(0).avgValues == Seq("20")) // (10+20+30)/3 — 1.2s included
    assert(rows(1).tsUs == 1500000L && rows(1).avgValues == Seq("45")) // (40+50)/2 — 1.2s absent
  }

  test("unparseable value contributes 0, not null/skip (cs:164-170)") {
    val rows = run(Seq(Seq(pt(0L, 0, Seq("6")), pt(1000000L, 1, Seq("oops")))))
    assert(rows.head.avgValues == Seq("3")) // (6 + 0) / 2
  }

  test("first-row-wins schema: names and positions come from the first event (cs:141-149)") {
    val rows = run(Seq(Seq(
      pt(0L, 0, names = Seq("a", "b"), values = Seq("1", "2")),
      pt(1000000L, 1, names = Seq("b", "a"), values = Seq("10", "20")))))
    // positional aggregation under the FIRST event's names — the
    // reference silently averages mismatched columns
    assert(rows.head.names == Seq("a", "b"))
    assert(rows.head.avgValues == Seq("5.5", "11")) // (1+10)/2, (2+20)/2
  }

  test("a later event with fewer fields than the first throws (cs:148 positional index)") {
    assertThrows[IndexOutOfBoundsException] {
      run(Seq(Seq(
        pt(0L, 0, names = Seq("a", "b"), values = Seq("1", "2")),
        pt(1000000L, 1, names = Seq("a"), values = Seq("9")))))
    }
  }

  test("window metadata is the first buffered event's (cs:141,154-156); sessionstart empty (cs:157)") {
    val rows = run(Seq(Seq(
      CompatPoint("k", 0L, 0, "devA", "sessA", Seq("v"), Seq("1")),
      CompatPoint("k", 1000000L, 1, "devB", "sessB", Seq("v"), Seq("2")))))
    val r = rows.head
    assert(r.deviceId == "devA" && r.sessionId == "sessA" && r.sessionStart == "")
  }
}
