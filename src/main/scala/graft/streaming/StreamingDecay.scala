package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming half-life decay scores — the live form of the batch
  * q_decay_counts query, maintained with the state shape its
  * hour-aligned / hard-horizon semantics were designed to enable: a
  * per-key RING BUFFER of ≤ 41 hour buckets (count + value mass per
  * bucket). Re-anchoring when a newer hour arrives is pure
  * relabeling — expired buckets drop, nothing else changes — so
  * there is NO accumulated truncation anywhere: the emitted score is
  * recomputed from the surviving buckets with exact dyadic 2^(40−k)
  * weights at every emission, and replaying the log reproduces the
  * batch query bit-for-bit for every key whose anchor has caught up
  * to the corpus max hour (StreamingDecaySpec pins both the per-key
  * algebra at any chunking and the stream ≡ oracled-batch rows).
  *
  * Why not a single decayed accumulator? A running sum shifted right
  * on re-anchor loses carry bits (two weight-1 events sum to 2, one
  * shift makes 1, but both should expire to 0) — the bucket buffer
  * is the smallest state that decays EXACTLY. It is also mergeable
  * (bucket-wise add after mutual re-anchor), the property a
  * state-store compaction or a two-stream union needs.
  *
  * State per key is ≤ 41 × 3 longs regardless of event count —
  * O(keys) total, the StreamingAnomaly bound. No timeout: a key's
  * buckets already age out through the horizon; an idle key's state
  * is at most 41 entries frozen until its next event or eviction
  * policy. */
object StreamingDecay {

  /** Hour-bucket ring buffer: (hour, n events, Σ value micro-units),
    * kept only for hours within the 40 h horizon of `anchorH`. */
  case class DecayState(anchorH: Long, nSeen: Long,
                        buckets: Seq[(Long, Long, Long)])

  case class DecayRow(user_id: Long, n_seen: Long, anchor_h: Long,
                      decayed_n_milli: Long, decayed_sum_u: Long)

  val zero: DecayState = DecayState(Long.MinValue, 0L, Seq.empty)

  /** Fold one key's micro-batch slice. Order-insensitive (bucket
    * adds commute; the anchor is a max) — pure, shared with tests. */
  def foldSlice(prev: DecayState, events: Seq[(Long, Long)]): DecayState = {
    val anchor = (prev.anchorH +: events.map(_._1)).max
    val kept = prev.buckets.filter { case (h, _, _) => anchor - h <= 40L }
    val merged = (kept ++ events.collect {
      case (h, yu) if anchor - h <= 40L => (h, 1L, yu)
    }).groupBy(_._1).toSeq.map { case (h, bs) =>
      (h, bs.map(_._2).sum, bs.map(_._3).sum)
    }.sortBy(_._1)
    DecayState(anchor, prev.nSeen + events.size, merged)
  }

  /** Exact dyadic score of a state at its own anchor: the same
    * Σ 2^(40−k) mass and single >> 40 normalization as the batch
    * query. */
  def score(st: DecayState): (Long, Long) = {
    val w = st.buckets.map { case (h, n, _) =>
      BigInt(n) << (40 - (st.anchorH - h)).toInt
    }.sum
    val wv = st.buckets.map { case (h, _, v) =>
      BigInt(v) << (40 - (st.anchorH - h)).toInt
    }.sum
    (((w * 1000) >> 40).toLong, (wv >> 40).toLong)
  }

  /** Streaming wrapper. Input: (user_id long, ts_us long, value
    * double). Output (Update mode): one refreshed DecayRow per
    * touched key per micro-batch, scored at the key's current
    * anchor hour. */
  def scores(spark: SparkSession, events: DataFrame): Dataset[DecayRow] = {
    import spark.implicits._
    events
      .select(col("user_id").cast("long"),
        expr("ts_us div 3600000000").as("h"),
        expr("cast(floor(value * cast(1000000 as double)) as bigint)")
          .as("yu"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[DecayState, DecayRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Long, Long)],
         state: GroupState[DecayState]) =>
          val slice = it.map(e => (e._2, e._3)).toVector
          val next = foldSlice(state.getOption.getOrElse(zero), slice)
          state.update(next)
          val (nMilli, sumU) = score(next)
          Iterator.single(DecayRow(uid, next.nSeen, next.anchorH,
            nMilli, sumU))
      }
  }
}
