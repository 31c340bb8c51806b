package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** The open session carried by [[SessionPathProcessor]]: gap clock plus
  * the first PathCap retained events.
  */
case class OpenSession(lastNs: Long, lastMs: Long, evs: Seq[PathEv])

/** Session-path assembly on the Spark 4 `transformWithState` API — the
  * modern port of [[StatefulOps.sessionPaths]] (and the fifth dual-API
  * operator after UV / bounce / funnel / churn). A session's path row
  * emits when an over-gap event opens the next session or when the
  * explicit event-time timer one gap past the last event fires; the
  * retained-event list is capped at the batch side's own PathCap, so
  * state is ≤24 small rows + 2 longs + one reconciled timer per
  * gap-active user. Requires the RocksDB state store provider.
  */
class SessionPathProcessor extends StatefulProcessor[Long, PathEvent, SessionPath] {
  @transient private var open: ValueState[OpenSession] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    open = getHandle.getValueState[OpenSession]("open",
      Encoders.product[OpenSession], TTLConfig.NONE)

  override def handleInputRows(uid: Long, rows: Iterator[PathEvent],
      timerValues: TimerValues): Iterator[SessionPath] = {
    val gapNs = graft.operators.Behavior.GapNs
    val cap = graft.operators.Behavior.PathCap
    val out = Seq.newBuilder[SessionPath]
    var st: Option[OpenSession] = if (open.exists()) Some(open.get()) else None
    rows.toSeq.sortBy(e => (e.tsNs, e.event_id)).foreach { e =>
      val pe = PathEv(e.tsNs, e.event_id, e.event_type)
      st = st match {
        case Some(s) if e.tsNs - s.lastNs <= gapNs =>
          Some(OpenSession(e.tsNs, e.ts.getTime,
            if (s.evs.length < cap) s.evs :+ pe else s.evs))
        case Some(s) =>
          out += SessionPath(uid, s.evs.map(_.eventType).mkString("->"))
          Some(OpenSession(e.tsNs, e.ts.getTime, Seq(pe)))
        case None =>
          Some(OpenSession(e.tsNs, e.ts.getTime, Seq(pe)))
      }
    }
    getHandle.listTimers().foreach(getHandle.deleteTimer)
    st.foreach { s =>
      open.update(s)
      getHandle.registerTimer(
        math.max(s.lastMs + gapNs / 1000000L,
          timerValues.getCurrentWatermarkInMs() + 1))
    }
    out.result().iterator
  }

  override def handleExpiredTimer(uid: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionPath] =
    if (open.exists()) {
      val s = open.get()
      open.clear()
      Iterator.single(SessionPath(uid, s.evs.map(_.eventType).mkString("->")))
    } else Iterator.empty
}

object SessionPathProcessor {
  /** Event-time wiring: input must carry a watermark on `ts`. */
  def apply(ev: Dataset[PathEvent]): Dataset[SessionPath] = {
    implicit val se = Encoders.product[SessionPath]
    ev.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new SessionPathProcessor, TimeMode.EventTime(),
        OutputMode.Append())
  }
}
