package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** The user's currently-open activity week (transformWithState state). */
case class ChurnOpenWeek(weekDays: Long, isNew: Long)

/** Weekly churn flags on the Spark 4 `transformWithState` API — the
  * modern port of [[StatefulOps.weeklyChurnFlags]], extending the
  * dual-API family (UV, bounce, funnel). Semantics are identical: a
  * week's (is_new, is_churned) row finalizes when the user's next
  * distinct week arrives (churned = successor ≠ week+7) or when an
  * explicit event-time timer two weeks past the week start fires with no
  * successor. Emitting FLAGS (not raw prev/next pointers) keeps the
  * timer-eviction path exact, exactly as in the mapGroups twin.
  *
  * State: one `ValueState[ChurnOpenWeek]` + one reconciled timer per
  * user active within the 2-week churn horizon; the expiry handler
  * clears both, so live state is bounded by recent actives. Requires the
  * RocksDB state store provider, like every transformWithState operator.
  */
class ChurnProcessor extends StatefulProcessor[Long, WeekEvent, WeekFlag] {
  @transient private var open: ValueState[ChurnOpenWeek] = _

  private val DayMs = 86400000L

  private def dateOf(epochDay: Long): java.sql.Date =
    java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(epochDay))

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    open = getHandle.getValueState[ChurnOpenWeek]("open",
      Encoders.product[ChurnOpenWeek], TTLConfig.NONE)

  override def handleInputRows(uid: Long, rows: Iterator[WeekEvent],
      timerValues: TimerValues): Iterator[WeekFlag] = {
    val out = Seq.newBuilder[WeekFlag]
    var st: Option[ChurnOpenWeek] =
      if (open.exists()) Some(open.get()) else None
    rows.map(_.week.toLocalDate.toEpochDay).toSeq.distinct.sorted
      .foreach { wd =>
        st match {
          case Some(s) if wd > s.weekDays =>
            val adjacent = wd == s.weekDays + 7
            out += WeekFlag(uid, dateOf(s.weekDays), s.isNew,
              if (adjacent) 0L else 1L)
            st = Some(ChurnOpenWeek(wd, if (adjacent) 0L else 1L))
          case Some(_) => // same week again — no-op
          case None =>
            st = Some(ChurnOpenWeek(wd, 1L))
        }
      }
    // timer reconciliation: exactly one live timer, two weeks past the
    // open week's start, clamped ahead of the watermark for users whose
    // whole activity is already far in the past (the churned case)
    getHandle.listTimers().foreach(getHandle.deleteTimer)
    st.foreach { s =>
      open.update(s)
      getHandle.registerTimer(
        math.max((s.weekDays + 14) * DayMs,
          timerValues.getCurrentWatermarkInMs() + 1))
    }
    out.result().iterator
  }

  override def handleExpiredTimer(uid: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[WeekFlag] =
    if (open.exists()) {
      val s = open.get()
      open.clear()
      Iterator.single(WeekFlag(uid, dateOf(s.weekDays), s.isNew, 1L))
    } else Iterator.empty
}

object ChurnProcessor {
  /** Event-time wiring: input must carry a watermark on `ts`. */
  def apply(ev: Dataset[WeekEvent]): Dataset[WeekFlag] = {
    implicit val we = Encoders.product[WeekFlag]
    ev.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new ChurnProcessor, TimeMode.EventTime(),
        OutputMode.Append())
  }
}
