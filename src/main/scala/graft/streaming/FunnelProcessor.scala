package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig, ValueState}

/** Funnel progression on the Spark 4 `transformWithState` API — the modern
  * counterpart of [[StatefulOps.funnelProgress]], completing the dual-API
  * story the UV ([[UniqueVisitProcessor]]) and bounce
  * ([[BounceProcessor]]) operators already carry. State is one
  * `ValueState[FunnelTimes]` per user holding the (t1,t2,t3) accumulator;
  * the step rule is shared semantics with the batch fold
  * (`operators.Behavior.funnelTimes`), so the in-order N-batch ≡ one-shot
  * argument carries over verbatim. Requires the RocksDB state store
  * provider (column families), like the other processors.
  */
class FunnelProcessor extends StatefulProcessor[Long, StageEvent, FunnelTimes] {
  @transient private var times: ValueState[FunnelTimes] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    times = getHandle.getValueState[FunnelTimes]("times",
      Encoders.product[FunnelTimes], TTLConfig.NONE)

  override def handleInputRows(uid: Long, rows: Iterator[StageEvent],
      timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[FunnelTimes] = {
    val W = graft.operators.Behavior.FunnelWindowNs
    var s = Option(times.get()).getOrElse(FunnelTimes(uid, -1L, -1L, -1L))
    rows.toSeq.sortBy(e => (e.tsNs, e.stage)).foreach { e =>
      s =
        if (e.stage == 1 && s.t1 < 0) s.copy(t1 = e.tsNs)
        else if (e.stage == 2 && s.t1 >= 0 && s.t2 < 0 &&
          e.tsNs > s.t1 && e.tsNs <= s.t1 + W) s.copy(t2 = e.tsNs)
        else if (e.stage == 3 && s.t2 >= 0 && s.t3 < 0 &&
          e.tsNs > s.t2 && e.tsNs <= s.t1 + W) s.copy(t3 = e.tsNs)
        else s
    }
    times.update(s)
    Iterator.single(s)
  }
}

object FunnelProcessor {
  /** No-timer wiring, deterministic under `processAllAvailable`. */
  def apply(ev: Dataset[StageEvent]): Dataset[FunnelTimes] = {
    implicit val fe = Encoders.product[FunnelTimes]
    ev.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new FunnelProcessor, TimeMode.None(),
        OutputMode.Update())
  }
}
