package graft

import graft.ops.EventOps

/** Pins the dyadic EWMA weighting (EventOps.ewmaOf) on hand-computed
  * fixtures: the most recent event carries weight 128, the oldest
  * in-frame event weight 1, rows without a full 8-event history never
  * emit, and a constant series smooths to itself exactly.
  */
class EwmaSpec extends SparkSpec {

  private def run(values: Seq[Double]) = {
    import spark.implicits._
    val df = values.zipWithIndex
      .map { case (v, i) => (1L, i.toLong * 1000000L, i.toLong, v) }
      .toDF("user_id", "ts_us", "event_id", "value")
    EventOps.ewmaOf(df).collect()
  }

  test("ramp 1..8 matches the hand-computed weighted sum") {
    // wsum = 8*128 + 7*64 + 6*32 + 5*16 + 4*8 + 3*4 + 2*2 + 1*1 = 1793
    // ewma_u = 1793_000000 div 255 = 7031372 (truncating)
    val rows = run((1 to 8).map(_.toDouble))
    assert(rows.length == 1) // rows 1..7 lack a full history
    assert(rows.head.getAs[Long]("ewma_u") == 1793000000L / 255L)
  }

  test("constant series smooths to the constant") {
    val rows = run(Seq.fill(10)(2.5))
    assert(rows.length == 3)
    // wsum = 2.5 * 255 -> ewma = 2.5 exactly
    assert(rows.forall(_.getAs[Long]("ewma_u") == 2500000L))
  }

  test("negative values truncate toward zero like the oracle") {
    val rows = run(Seq.fill(8)(-1.1))
    // wsum = -1.1 * 255 = -280.5 -> -280500000 div 255 = -1100000
    assert(rows.head.getAs[Long]("ewma_u") == -1100000L)
  }
}
