package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key anomaly detection with BOUNDED custom state —
  * the production-grade `GroupState` pattern the compat path
  * deliberately doesn't use (it replicates the reference's unbounded,
  * never-expiring queue).
  *
  * State per key is three numbers (n, Σv, Σv²) — constant size no
  * matter how many events a key has seen, which is what makes this
  * viable over millions of keys: the state store holds O(keys), never
  * O(events). Each event is scored against the running mean/std of
  * the PRIOR events of its key (so an outlier can't mask itself), then
  * folded in. Idle keys are evicted via event-time timeout: once the
  * watermark passes last-seen + idleTimeout, the state is dropped and
  * the key starts cold on its next event — the standard TTL trade.
  */
object StreamingAnomaly {

  /** Running power sums — the constant-size sufficient statistic. */
  case class RunStats(n: Long, sum: Double, sumSq: Double, lastTsMs: Long)

  case class Anomaly(userId: Long, tsMs: Long, value: Double, z: Double)

  /** Score events within one key's micro-batch slice (ts order),
    * starting from `prev`; returns updated stats and flagged rows.
    * Pure function — shared by the streaming wrapper and tests. */
  def scoreSlice(prev: RunStats, events: Seq[(Long, Long, Double)],
                 minN: Long, threshold: Double): (RunStats, Vector[Anomaly]) =
    events.sortBy(e => (e._2, e._3)).foldLeft((prev, Vector.empty[Anomaly])) {
      case ((st, out), (uid, tsMs, v)) =>
        val flagged =
          if (st.n >= minN) {
            val mean = st.sum / st.n
            val variance = math.max(0.0, st.sumSq / st.n - mean * mean)
            val sd = math.sqrt(variance)
            sd > 0 && math.abs(v - mean) / sd > threshold
          } else false
        val next = RunStats(st.n + 1, st.sum + v, st.sumSq + v * v,
          math.max(st.lastTsMs, tsMs))
        (next, if (flagged) {
          val mean = st.sum / st.n
          val sd = math.sqrt(math.max(0.0, st.sumSq / st.n - mean * mean))
          out :+ Anomaly(uid, tsMs, v, (v - mean) / sd)
        } else out)
    }

  /** Streaming wrapper. Input: (user_id long, ts timestamp, value
    * double); the watermark (required by the event-time timeout) is
    * applied here, after the type-normalizing projection — projecting
    * a watermarked column through a cast strips the watermark tag. */
  def detect(spark: SparkSession, events: DataFrame,
             minN: Long = 10L, threshold: Double = 3.0,
             idleTimeout: String = "1 hour",
             watermarkDelay: String = "10 seconds"): Dataset[Anomaly] = {
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("value").cast("double"))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[RunStats, Anomaly](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[(Long, Timestamp, Double)], state: GroupState[RunStats]) =>
          if (state.hasTimedOut) {
            state.remove() // idle key: drop the three numbers, start cold later
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(RunStats(0L, 0.0, 0.0, 0L))
            val batch = it.map(e => (e._1, e._2.getTime, e._3)).toVector
            val (next, flagged) = scoreSlice(prev, batch, minN, threshold)
            state.update(next)
            state.setTimeoutTimestamp(next.lastTsMs, idleTimeout)
            flagged.iterator
          }
      }
  }
}
