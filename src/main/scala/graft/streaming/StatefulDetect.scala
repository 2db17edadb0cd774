package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ST4: the pure-streaming suspicious-IP detector — per-key state with
  * TTL via flatMapGroupsWithState, replacing the batch-job + KV-store
  * feedback loop (reference diagram.svg:3) with in-stream state.
  *
  * State per user: current-hour event count, last event time, min
  * inter-arrival gap, flagged?. A user is emitted ONCE, when it first
  * crosses either bot signal (hourly rate or sub-second gap — reference
  * generator.py:126,147-150). Processing-time timeout evicts idle keys:
  * the DynamoDB-TTL analog, bounding state size on an unbounded key
  * space — without it a 100TB-scale stream would accumulate state
  * forever.
  */
object StatefulDetect {

  final case class UserEvent(user_ip: String, ts: java.sql.Timestamp)
  final case class UserStats(hourStart: Long, n: Long, lastUs: Long,
      minGapUs: Long, flagged: Boolean)
  final case class Suspicious(user_ip: String, reason: String)

  /** @param idleTtl Some(duration): evict idle keys via processing-time
    *        timeout — the production setting for unbounded key spaces.
    *        None: no timeout — required for bounded replays driven by
    *        processAllAvailable(), where timeout-scheduled batches would
    *        keep the query from ever settling. */
  def suspicious(events: DataFrame, maxHourly: Long = 1000, minGapMs: Long = 1000,
      idleTtl: Option[String] = Some("2 hours")): Dataset[Suspicious] = {
    val s = events.sparkSession
    import s.implicits._
    val timeout = if (idleTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.select(col("user_ip"), col("ts"))
      .as[UserEvent]
      .groupByKey(_.user_ip)
      .flatMapGroupsWithState[UserStats, Suspicious](OutputMode.Append, timeout) {
        (key, it, state: GroupState[UserStats]) =>
          if (state.hasTimedOut) { // TTL eviction (the DynamoDB expiry analog)
            state.remove()
            Iterator.empty
          } else {
            val evs = it.toSeq.sortBy(_.ts.getTime)
            var st = state.getOption.getOrElse(UserStats(-1L, 0L, -1L, Long.MaxValue, flagged = false))
            val wasFlagged = st.flagged
            // the rate signal must be checked at every threshold crossing
            // INSIDE the fold: an hour rollover later in the same batch
            // resets the counter, and a post-fold check would miss a
            // spike that completed within the batch
            var rateHit = false
            evs.foreach { e =>
              val us = e.ts.getTime * 1000L
              val hour = us / 3600000000L
              // micro-batches are not globally time-ordered (file source
              // orders by mod time): treat events older than lastUs as
              // late data — they must not produce negative "gaps", and
              // their hours don't reset the current-hour count.
              val gap = if (st.lastUs >= 0 && us >= st.lastUs) us - st.lastUs else Long.MaxValue
              val n2 = if (hour == st.hourStart) st.n + 1
                       else if (hour > st.hourStart) 1L
                       else st.n
              if (n2 > maxHourly) rateHit = true
              st = UserStats(
                hourStart = math.max(hour, st.hourStart),
                n = n2,
                lastUs = math.max(us, st.lastUs),
                minGapUs = math.min(st.minGapUs, gap),
                flagged = st.flagged)
            }
            val gapHit = st.minGapUs < minGapMs * 1000L
            st = st.copy(flagged = st.flagged || rateHit || gapHit)
            state.update(st)
            idleTtl.foreach(state.setTimeoutDuration)
            if (!wasFlagged && st.flagged)
              Iterator(Suspicious(key, if (gapHit) "gap" else "rate"))
            else Iterator.empty
          }
      }
  }
}
