package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig, ValueState}

/** UV dedup on the Spark 4 `transformWithState` API — the modern
  * counterpart of [[StatefulOps.uniqueVisits]]: a `ValueState[String]` of
  * the last seen day. The reference's 24 h `StateTtlConfig`
  * (`RT/app/dwd/UniqueVisitApp.java:67-70`) maps onto
  * `TTLConfig(Duration.ofHours(24))` in the [[UniqueVisitProcessor.withTtl]]
  * wiring. Requires the RocksDB state store provider (column families).
  *
  * Round-1 note resolved: the documented "RocksDB native init hang" was
  * actually `TimeMode.ProcessingTime()` making the micro-batch engine
  * re-trigger indefinitely (`processAllAvailable` never drained) — RocksDB
  * itself initializes fine (`graft.tools.RocksProbe`). The no-timer wiring
  * uses `TimeMode.None` and is spec-tested; the TTL'd wiring needs
  * processing-time mode and therefore a real trigger cadence, so it is the
  * production shape, not the test-harness one.
  */
class UniqueVisitProcessor(ttl: TTLConfig) extends StatefulProcessor[String, PageLog, Visit] {
  @transient private var lastDay: ValueState[String] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    lastDay = getHandle.getValueState[String]("lastDay", Encoders.STRING, ttl)

  override def handleInputRows(mid: String, rows: Iterator[PageLog],
      timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[Visit] = {
    val out = Seq.newBuilder[Visit]
    rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
      val day = e.ts.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
      val seen = Option(lastDay.get())
      if (e.isEntry && !seen.contains(day)) {
        out += Visit(mid, day, e.ts)
        lastDay.update(day)
      }
    }
    out.result().iterator
  }
}

object UniqueVisitProcessor {
  /** No-timer wiring (unbounded state): deterministic under
    * `processAllAvailable`, used by the cross-check spec.
    */
  def apply(logs: Dataset[PageLog]): Dataset[Visit] = {
    implicit val ve = Encoders.product[Visit]
    logs.groupByKey(_.mid)(Encoders.STRING)
      .transformWithState(new UniqueVisitProcessor(TTLConfig.NONE),
        TimeMode.None(), OutputMode.Append())
  }

  /** Production wiring with the reference's 24 h state TTL (processing-time
    * mode — state for idle devices is evicted by the engine, the
    * `StateTtlConfig` contract).
    */
  def withTtl(logs: Dataset[PageLog], ttl: Duration = Duration.ofHours(24)): Dataset[Visit] = {
    implicit val ve = Encoders.product[Visit]
    logs.groupByKey(_.mid)(Encoders.STRING)
      .transformWithState(new UniqueVisitProcessor(TTLConfig(ttl)),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
