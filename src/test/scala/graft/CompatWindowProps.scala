package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.streaming.DataDrivenWindow._
import graft.streaming.StreamingAnomaly
import graft.streaming.StreamingAnomaly.RunStats

/** ScalaCheck properties over the pure per-key cores (no SparkSession
  * — sbt runs `Properties` via its native ScalaCheck framework, since
  * the offline dep set has no scalatest↔scalacheck bridge).
  *
  * These randomize what the fixture specs pin: arbitrary event values,
  * timestamps, and batch splits. */
object CompatWindowProps extends Properties("graft.pure-cores") {

  private val genPoint: Gen[Long => CompatPoint] = for {
    dtUs <- Gen.chooseNum(0L, 700000L) // inter-event gap: 0..0.7s
    v <- Gen.oneOf(Gen.chooseNum(-1000, 1000).map(_.toString),
      Gen.oneOf("garbage", "", "1.5", "-2.25")) // parse0 territory
  } yield (ts: Long) => CompatPoint("k", ts + dtUs, 0L, "d", "s",
    Seq("f1", "f2"), Seq(v, v))

  private val genEvents: Gen[Vector[CompatPoint]] = for {
    n <- Gen.chooseNum(1, 60)
    mks <- Gen.listOfN(n, genPoint)
  } yield mks.foldLeft((0L, Vector.empty[CompatPoint])) {
    case ((ts, acc), mk) =>
      val p = mk(ts)
      (p.tsUs, acc :+ p.copy(seq = acc.length.toLong))
  }._2

  // replay is a fold: replay(whole) == replay(prefix) then replay(rest)
  // from the carried state — output independent of WHERE the batch
  // sequence is cut (not of how events are grouped INTO batches, which
  // the reference's one-drain-per-batch rule makes semantic).
  property("replay fold-composes across any cut point") =
    Prop.forAll(genEvents, Gen.chooseNum(0, 10)) { (events, cutSeed) =>
      val batches = events.grouped(7).toVector
      val cut = if (batches.isEmpty) 0 else cutSeed % (batches.length + 1)
      val (sWhole, rWhole) = replay(emptyState, batches.iterator)
      val (s1, r1) = replay(emptyState, batches.take(cut).iterator)
      val (s2, r2) = replay(s1, batches.drop(cut).iterator)
      Prop(sWhole == s2 && rWhole == (r1 ++ r2))
    }

  // conservation: every input event is exactly one of emitted-in-a-
  // window, still queued, or destroyed by an underflow/loss — none
  // appear twice, none vanish untracked. Counted per batch step.
  property("events are conserved: emitted + queued + lost = input") =
    Prop.forAll(genEvents) { events =>
      val batches = events.grouped(5).toVector
      var st = emptyState
      var emitted = 0
      var lost = 0
      batches.foreach { b =>
        val before = st.queue.length + b.length
        val (next, row) = processBatch(st, b)
        val drained = before - next.queue.length
        row match {
          case Some(_) => emitted += drained
          case None => lost += drained // 0 unless underflow wiped the queue
        }
        st = next
      }
      Prop(emitted + lost + st.queue.length == events.length)
    }

  // parse0 is total: any string folds to a decimal, never throws
  property("parse0 is total") = Prop.forAll { (s: String) =>
    parse0(s); Prop.passed
  }

  // anomaly scoring core: split invariance for ts-ordered slices
  property("scoreSlice fold-composes across any cut point") =
    Prop.forAll(Gen.chooseNum(1, 40), Gen.chooseNum(0, 40)) { (n, cutSeed) =>
      val events = (0 until n).map(i =>
        (1L, 1700000000000L + i * 1000L, (i % 7).toDouble * 3 - 5))
      val cut = cutSeed % (n + 1)
      val zero = RunStats(0L, 0.0, 0.0, 0L)
      val (sW, aW) = StreamingAnomaly.scoreSlice(zero, events, 5L, 2.0)
      val (s1, a1) = StreamingAnomaly.scoreSlice(zero, events.take(cut), 5L, 2.0)
      val (s2, a2) = StreamingAnomaly.scoreSlice(s1, events.drop(cut), 5L, 2.0)
      Prop(sW == s2 && aW == a1 ++ a2)
    }
}
