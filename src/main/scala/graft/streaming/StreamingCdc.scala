package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC log compaction — the live form of the batch
  * q_cdc_apply query: per key, maintain the last-writer-wins state
  * (last op / sequence / payload, change count) as insert/update/
  * delete changes arrive, emitting the key's refreshed state every
  * micro-batch that touches it. A key whose latest change is a delete
  * stays present as a TOMBSTONE row (op = 'D') — downstream sinks
  * need the tombstone to propagate the deletion, which is why the
  * stream emits it while the batch snapshot query drops it; filtering
  * op != 'D' on the stream's final states reproduces the batch
  * snapshot exactly (pinned by StreamingCdcSpec).
  *
  * State per key is one fixed-size record regardless of log length —
  * the state store IS the materialized table, O(keys) like every
  * real CDC sink. No timeout: compaction state has no idle-eviction
  * semantics (a key's last state stays current until overwritten);
  * at 100 TB the state store is RocksDB-backed and the same size as
  * the table it materializes.
  */
object StreamingCdc {

  /** Last-writer-wins register + change count. */
  case class CdcState(lastTsUs: Long, lastEventId: Long, lastOp: String,
                      lastValueU: Long, nChanges: Long)

  case class CdcRow(user_id: Long, last_op: String, last_ts_us: Long,
                    last_value_u: Long, n_changes: Long)

  /** Fold one key's micro-batch slice (sequence order: ts, event_id)
    * into the register. Pure — shared by the wrapper and tests. */
  def foldSlice(prev: Option[CdcState],
                changes: Seq[(Long, Long, String, Long)]): CdcState =
    changes.sortBy(c => (c._1, c._2)).foldLeft(
      prev.getOrElse(CdcState(Long.MinValue, Long.MinValue, "", 0L, 0L))) {
      case (st, (tsUs, eid, op, valueU)) =>
        val newer = tsUs > st.lastTsUs ||
          (tsUs == st.lastTsUs && eid > st.lastEventId)
        if (newer) CdcState(tsUs, eid, op, valueU, st.nChanges + 1)
        else st.copy(nChanges = st.nChanges + 1)
    }

  /** Streaming wrapper. Input: (user_id long, event_id long,
    * ts_us long, event_type string, value double) — the same derived
    * I/U/D mapping as the batch query. Output (Update mode): one
    * refreshed CdcRow per touched key per micro-batch. */
  def compact(spark: SparkSession, changes: DataFrame): Dataset[CdcRow] = {
    import spark.implicits._
    changes
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts_us").cast("long"),
        when(col("event_type") === "signup", "I")
          .when(col("event_type") === "error", "D")
          .otherwise("U").as("op"),
        expr("cast(floor(value * cast(1000000 as double)) as bigint)")
          .as("value_u"))
      .as[(Long, Long, Long, String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[CdcState, CdcRow](GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Long, Long, String, Long)],
         state: GroupState[CdcState]) =>
          val slice = it.map(c => (c._3, c._2, c._4, c._5)).toVector
          val next = foldSlice(state.getOption, slice)
          state.update(next)
          CdcRow(uid, next.lastOp, next.lastTsUs, next.lastValueU,
            next.nChanges)
      }
  }
}
