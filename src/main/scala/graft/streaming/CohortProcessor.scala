package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** A user's cohort assignment + last emitted offset (tws state). */
case class CohortMark(cohortDays: Long, lastOffset: Long)

/** Cohort-cell membership on the Spark 4 `transformWithState` API — the
  * modern port of [[StatefulOps.cohortCells]]. Same in-order argument:
  * the first event's week IS the cohort and weeks arrive nondecreasing,
  * so (cohort, last offset) is the whole state; no timers (cohort
  * membership is forever — 16 B per user, TTL-able at a finite horizon
  * via the same TTLConfig the UV processor uses).
  */
class CohortProcessor extends StatefulProcessor[Long, WeekEvent, CohortCell] {
  @transient private var mark: ValueState[CohortMark] = _

  private def dateOf(epochDay: Long): java.sql.Date =
    java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(epochDay))

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    mark = getHandle.getValueState[CohortMark]("mark",
      Encoders.product[CohortMark], TTLConfig.NONE)

  override def handleInputRows(uid: Long, rows: Iterator[WeekEvent],
      timerValues: TimerValues): Iterator[CohortCell] = {
    val out = Seq.newBuilder[CohortCell]
    var st: Option[CohortMark] = if (mark.exists()) Some(mark.get()) else None
    rows.map(_.week.toLocalDate.toEpochDay).toSeq.distinct.sorted
      .foreach { wd =>
        st match {
          case None =>
            out += CohortCell(uid, dateOf(wd), 0L)
            st = Some(CohortMark(wd, 0L))
          case Some(s) =>
            val off = (wd - s.cohortDays) / 7
            if (off > s.lastOffset) {
              out += CohortCell(uid, dateOf(s.cohortDays), off)
              st = Some(s.copy(lastOffset = off))
            }
        }
      }
    st.foreach(mark.update)
    out.result().iterator
  }

  override def handleExpiredTimer(uid: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[CohortCell] =
    Iterator.empty
}

/** A user's last emitted activity day (tws state). */
case class LastDayMark(epochDay: Long)

/** First-daily-activity dedup on the Spark 4 `transformWithState` API —
  * the modern port of [[StatefulOps.firstDailyActivity]]. One long per
  * user; an explicit event-time timer two days past the last activity
  * evicts the state (in-order, that day can no longer reappear).
  */
class ActivityProcessor extends StatefulProcessor[Long, DayEvent, DayUser] {
  @transient private var last: ValueState[LastDayMark] = _

  private val DayMs = 86400000L

  private def dateOf(epochDay: Long): java.sql.Date =
    java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(epochDay))

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    last = getHandle.getValueState[LastDayMark]("last",
      Encoders.product[LastDayMark], TTLConfig.NONE)

  override def handleInputRows(uid: Long, rows: Iterator[DayEvent],
      timerValues: TimerValues): Iterator[DayUser] = {
    val out = Seq.newBuilder[DayUser]
    var lastDay =
      if (last.exists()) last.get().epochDay else Long.MinValue
    rows.map(_.day.toLocalDate.toEpochDay).toSeq.distinct.sorted
      .foreach { d =>
        if (d > lastDay) { out += DayUser(uid, dateOf(d)); lastDay = d }
      }
    last.update(LastDayMark(lastDay))
    getHandle.listTimers().foreach(getHandle.deleteTimer)
    getHandle.registerTimer(
      math.max((lastDay + 2) * DayMs,
        timerValues.getCurrentWatermarkInMs() + 1))
    out.result().iterator
  }

  override def handleExpiredTimer(uid: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[DayUser] = {
    last.clear()
    Iterator.empty
  }
}

object CohortProcessor {
  /** No-timer wiring, deterministic under `processAllAvailable`. */
  def apply(ev: Dataset[WeekEvent]): Dataset[CohortCell] = {
    implicit val ce = Encoders.product[CohortCell]
    ev.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new CohortProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}

object ActivityProcessor {
  /** Event-time wiring: input must carry a watermark on `ts`. */
  def apply(ev: Dataset[DayEvent]): Dataset[DayUser] = {
    implicit val de = Encoders.product[DayUser]
    ev.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new ActivityProcessor, TimeMode.EventTime(),
        OutputMode.Append())
  }
}
