package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM drift monitor — the live form of the batch
  * q_cusum_changepoint scan, deployed the way production monitoring
  * actually splits the work: a BATCH job computes per-key baselines
  * (n, Σv — yesterday's moments), and the stream folds the textbook
  * recurrence S⁺ = max(0, S⁺ + dev), S⁻ = max(0, S⁻ − dev) against
  * those frozen baselines with CONSTANT state per key (five numbers),
  * emitting each touched key's refreshed max excursions every
  * micro-batch.
  *
  * Arithmetic is the batch twin's exactly: deviations are n-scaled
  * integers (dev = n·yu − Σv, division-free), accumulated in BigInt
  * (stored as DECIMAL(38,0) state — the same headroom argument as the
  * batch window sums), normalized once on emission by the positive
  * `div n`. Replaying the event-time-ordered log therefore reproduces
  * the batch query bit-for-bit at ANY micro-batch chunking
  * (StreamingCusumSpec pins stream ≡ batch, and the batch side is
  * itself DuckDB-oracled) — the recurrence is order-dependent, so the
  * equivalence holds when arrival order matches event-time order,
  * exactly the contract a replayed log or watermark-reordered source
  * provides.
  *
  * No timeout: a drift monitor's excursion maxima stay meaningful
  * for a key's lifetime (state is O(keys), five numbers each); a
  * deployment that wants TTL eviction composes the StreamingAnomaly
  * event-time-timeout pattern unchanged.
  */
object StreamingCusum {

  /** Five-number constant state: prefix sum, its running min/max,
    * and the two max excursions (all in n-scaled micro-units). */
  case class CusumState(p: BigInt, minP: BigInt, maxP: BigInt,
                        maxUp: BigInt, maxDn: BigInt, nSeen: Long)

  case class CusumRow(user_id: Long, n_seen: Long,
                      max_up_u: Long, max_dn_u: Long)

  val zero: CusumState =
    CusumState(BigInt(0), BigInt(0), BigInt(0), BigInt(0), BigInt(0), 0L)

  /** Fold one key's micro-batch slice (event-time order: ts,
    * event_id) against a frozen (n, Σv) baseline. Pure — shared by
    * the wrapper and the replay spec. */
  def foldSlice(prev: CusumState, events: Seq[(Long, Long, Long)],
                n: Long, vsum: BigInt): CusumState =
    events.sortBy(e => (e._1, e._2)).foldLeft(prev) {
      case (st, (_, _, yu)) =>
        val p = st.p + BigInt(n) * yu - vsum
        val minP = st.minP.min(p)
        val maxP = st.maxP.max(p)
        val sUp = p - minP.min(BigInt(0))
        val sDn = maxP.max(BigInt(0)) - p
        CusumState(p, minP, maxP, st.maxUp.max(sUp), st.maxDn.max(sDn),
          st.nSeen + 1)
    }

  /** Streaming wrapper. Input: (user_id long, ts_us long, event_id
    * long, value double); `baselines` maps key → (n, Σv micro-units),
    * the batch job's per-key moments (at scale: a broadcast of the
    * baseline table, the stream-side pattern for slowly-changing
    * reference data). Output (Update mode): one refreshed CusumRow
    * per touched key per micro-batch. */
  def monitor(spark: SparkSession, events: DataFrame,
              baselines: Map[Long, (Long, BigInt)]): Dataset[CusumRow] = {
    import spark.implicits._
    val base = spark.sparkContext.broadcast(baselines)
    events
      .select(col("user_id").cast("long"), col("ts_us").cast("long"),
        col("event_id").cast("long"),
        expr("cast(floor(value * cast(1000000 as double)) as bigint)")
          .as("yu"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CusumState, CusumRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Long, Long, Long)],
         state: GroupState[CusumState]) =>
          base.value.get(uid) match {
            case None => Iterator.empty // unknown key: no baseline yet
            case Some((n, vsum)) =>
              val slice = it.map(e => (e._2, e._3, e._4)).toVector
              val next = foldSlice(state.getOption.getOrElse(zero),
                slice, n, vsum)
              state.update(next)
              Iterator.single(CusumRow(uid, next.nSeen,
                (next.maxUp / n).toLong, (next.maxDn / n).toLong))
          }
      }
  }
}
