package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.DataDrivenWindow
import graft.streaming.DataDrivenWindow._

/** Properties of the data-driven window replay (SURVEY §5.2), checked
  * over seeded-random event streams: drain-shape invariants, event
  * conservation (each input event is in exactly one emitted window,
  * lost to an underflow, or still queued), and — the key one — split
  * equivalence at batch granularity: replay is a pure fold over the
  * batch sequence, which is exactly why the Structured Streaming
  * wrapper (one processBatch per micro-batch with carried state)
  * computes the same answer as the batch fold.
  *
  * (Plain seeded-random loops rather than ScalaCheck's ScalaTest
  * bridge — the offline dependency set has no scalatestplus artifact.)
  */
class WindowPropertySpec extends AnyFunSuite {

  private def genEvents(rnd: scala.util.Random, maxN: Int = 120): Vector[CompatPoint] = {
    val n = rnd.nextInt(maxN + 1)
    var ts = 0L
    Vector.tabulate(n) { i =>
      ts += rnd.nextLong(700001L) // 0-0.7s gaps
      CompatPoint("k", ts, i.toLong, "dev", "sess", Seq("v"), Seq("1"))
    }
  }

  private def genBatches(rnd: scala.util.Random): Vector[Vector[CompatPoint]] = {
    val pts = genEvents(rnd)
    val out = Vector.newBuilder[Vector[CompatPoint]]
    var rest = pts
    while (rest.nonEmpty) {
      val k = 1 + rnd.nextInt(20)
      out += rest.take(k)
      rest = rest.drop(k)
    }
    out.result()
  }

  private def trials(seed: Long)(body: scala.util.Random => Unit): Unit = {
    val rnd = new scala.util.Random(seed)
    (1 to 200).foreach(_ => body(rnd))
  }

  test("drainOnce: window = queue prefix through first >=1s boundary; underflow iff none exists") {
    trials(42L) { rnd =>
      val q = genEvents(rnd, 40)
      DataDrivenWindow.drainOnce(q) match {
        case Right((row, rest)) =>
          val w = q.dropRight(rest.length)
          assert(w ++ rest == q) // consumed prefix + rest = queue
          assert(row.tsUs == q.head.tsUs)
          assert(w.init.forall(p => p.tsUs - q.head.tsUs < WindowUs)) // in-window
          assert(w.last.tsUs - q.head.tsUs >= WindowUs) // boundary consumed
        case Left(lost) =>
          assert(lost == q.length) // underflow pops (and loses) everything
          assert(q.forall(p => p.tsUs - q.headOption.map(_.tsUs).getOrElse(0L) < WindowUs))
      }
    }
  }

  test("processBatch: start only advances, to the last boundary-crossing event's ts") {
    trials(43L) { rnd =>
      val st0 = emptyState
      val batch = genEvents(rnd, 40)
      val (st1, _) = DataDrivenWindow.processBatch(st0, batch)
      if (batch.nonEmpty) {
        assert(st1.startUs.isDefined)
        val expected = batch.foldLeft(batch.head.tsUs) { (s, p) =>
          if (p.tsUs - s >= WindowUs) p.tsUs else s
        }
        assert(st1.startUs.contains(expected))
      }
    }
  }

  test("conservation: every event is emitted-in-one-window, underflow-lost, or still queued") {
    trials(44L) { rnd =>
      val batches = genBatches(rnd)
      val all = batches.flatten
      // count consumed events by replaying and diffing queue sizes
      var st = emptyState
      var consumed = 0
      var emitted = 0
      batches.foreach { b =>
        val before = st.queue.length + b.length
        val (next, row) = DataDrivenWindow.processBatch(st, b)
        consumed += before - next.queue.length
        emitted += row.size
        st = next
      }
      assert(consumed + st.queue.length == all.length)
      assert(st.queue == all.takeRight(st.queue.length)) // queue is an in-order suffix
    }
  }

  test("split equivalence: replay(batches) == replay(chunk1) ++ replay(chunk2) with carried state") {
    trials(45L) { rnd =>
      val batches = genBatches(rnd)
      val cut = if (batches.isEmpty) 0 else rnd.nextInt(batches.length + 1)
      val (s1, r1) = DataDrivenWindow.replay(emptyState, batches.take(cut).iterator)
      val (s2, r2) = DataDrivenWindow.replay(s1, batches.drop(cut).iterator)
      val (sAll, rAll) = DataDrivenWindow.replay(emptyState, batches.iterator)
      assert(r1 ++ r2 == rAll)
      assert(s2 == sAll)
    }
  }

  test("avg of a constant stream is the constant, regardless of batching") {
    trials(46L) { rnd =>
      val rows = DataDrivenWindow.replay(emptyState, genBatches(rnd).iterator)._2
      assert(rows.forall(_.avgValues == Seq("1")))
    }
  }

  test("parse0: numeric strings parse, junk is 0, never throws") {
    assert(parse0("1.5") == BigDecimal("1.5"))
    assert(parse0("-2") == BigDecimal(-2))
    assert(parse0("1.2E-5") == BigDecimal("0.000012"))
    assert(parse0("abc") == BigDecimal(0))
    assert(parse0("") == BigDecimal(0))
    val rnd = new scala.util.Random(47L)
    (1 to 500).foreach { _ =>
      val s = rnd.nextString(rnd.nextInt(12))
      parse0(s) // total function: must not throw on arbitrary input
    }
  }
}
