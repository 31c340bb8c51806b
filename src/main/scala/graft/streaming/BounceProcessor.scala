package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Bounce (jump-out) detection on the Spark 4 `transformWithState` API —
  * the modern port of [[StatefulOps.bounces]], completing the API pair the
  * UV op already has ([[UniqueVisitProcessor]]). The CEP semantics are
  * unchanged (reference `RT/app/dwd/UserJumpDetailApp.java:60-108`): a
  * session entry bounces when the NEXT event within 10 s is also an entry
  * (match path) or when nothing arrives within 10 s (timeout path).
  *
  * State: one `ValueState[Long]` — the pending entry's event-time millis.
  * The timeout path uses transformWithState's EXPLICIT event-time timers
  * instead of `GroupStateTimeout`: after each input batch the processor
  * reconciles its timers (delete stale, register pending + 10 s), and
  * [[handleExpiredTimer]] emits the bounce when the watermark passes the
  * registered expiry with the entry still unresolved. StatefulOpsSpec
  * drives the SAME 4-path fixture through both APIs and asserts equal
  * output. Requires the RocksDB state store provider, like every
  * transformWithState operator.
  */
class BounceProcessor extends StatefulProcessor[String, PageLog, Bounce] {
  @transient private var pending: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    pending = getHandle.getValueState[Long]("pending", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(mid: String, rows: Iterator[PageLog],
      timerValues: TimerValues): Iterator[Bounce] = {
    val out = Seq.newBuilder[Bounce]
    var p: Option[Long] = if (pending.exists()) Some(pending.get()) else None
    rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
      val t = e.ts.getTime
      p match {
        case Some(pv) if t - pv > StatefulOps.BounceWaitMs =>
          out += Bounce(mid, new Timestamp(pv))
          p = if (e.isEntry) Some(t) else None
        case Some(pv) =>
          if (e.isEntry) { out += Bounce(mid, new Timestamp(pv)); p = Some(t) }
          else p = None
        case None =>
          if (e.isEntry) p = Some(t)
      }
    }
    // timer reconciliation: exactly one live timer, at pending + wait
    getHandle.listTimers().foreach(getHandle.deleteTimer)
    p match {
      case Some(pv) =>
        pending.update(pv)
        getHandle.registerTimer(pv + StatefulOps.BounceWaitMs)
      case None => pending.clear()
    }
    out.result().iterator
  }

  override def handleExpiredTimer(mid: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[Bounce] =
    if (pending.exists() &&
      expiredTimerInfo.getExpiryTimeInMs() == pending.get() + StatefulOps.BounceWaitMs) {
      val pv = pending.get()
      pending.clear()
      Iterator.single(Bounce(mid, new Timestamp(pv)))
    } else Iterator.empty
}

object BounceProcessor {
  /** Event-time wiring: input must carry a watermark on `ts` (drives both
    * record processing and the explicit timeout timers).
    */
  def apply(logs: Dataset[PageLog]): Dataset[Bounce] = {
    implicit val be = Encoders.product[Bounce]
    logs.groupByKey(_.mid)(Encoders.STRING)
      .transformWithState(new BounceProcessor, TimeMode.EventTime(), OutputMode.Append())
  }
}
