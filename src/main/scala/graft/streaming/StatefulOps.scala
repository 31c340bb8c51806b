package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Page-view log record (the reference's dwd_page_log shape: device id,
  * previous page — empty/null marks a session entry — and event time).
  */
case class PageLog(mid: String, lastPageId: String, ts: Timestamp) {
  def isEntry: Boolean = lastPageId == null || lastPageId.isEmpty
}

/** A detected jump-out (bounce): the session-entry record itself. */
case class Bounce(mid: String, ts: Timestamp)

/** A deduplicated first-visit-of-day record. */
case class Visit(mid: String, day: String, ts: Timestamp)

/** A page log with the claimed first-visit flag (BaseLogApp's is_new). */
case class FlaggedLog(mid: String, lastPageId: String, ts: Timestamp, isNew: Boolean)

/** A raw user event (the `events` table shape) with full-precision time. */
case class RawEvent(user_id: Long, event_id: Long, ts: Timestamp, tsNs: Long)

/** A bounce detected on the raw event stream (full-precision key). */
case class UserBounce(user_id: Long, tsNs: Long)

/** A document entering the ingest pipeline: content fingerprint + id. */
case class DocRecord(fp: String, docId: Long, ts: Timestamp)

/** A funnel stage event (stage ∈ 1..3) with full-precision event time. */
case class StageEvent(user_id: Long, stage: Int, ts: Timestamp, tsNs: Long)

/** A typed event on the live transition stream. */
case class PathEvent(user_id: Long, event_id: Long, ts: Timestamp, tsNs: Long,
    event_type: String)

/** One in-session (src → dst) transition emitted by the live grid. */
case class Transition(src: String, dst: String)

private case class LastEvent(tsNs: Long, eventType: String, tsMillis: Long)

/** A user-activity event carrying its pre-truncated activity day. */
case class DayEvent(user_id: Long, ts: Timestamp, day: java.sql.Date)

/** A first-occurrence (user, day) activity emission — the distinct
  * (day, user) frame `operators.Behavior.rollingActive` consumes.
  */
case class DayUser(user_id: Long, day: java.sql.Date)

private case class LastDaySt(epochDay: Long)

/** A user-activity event carrying its pre-truncated ISO week start. */
case class WeekEvent(user_id: Long, ts: Timestamp, week: java.sql.Date)

/** A first-time (cohort_week, offset_w) cell-membership emission; counting
  * these per cell yields `cohort_retention`'s active_users matrix.
  */
case class CohortCell(user_id: Long, cohort_week: java.sql.Date, offset_w: Long)

private case class CohortSt(cohortDays: Long, lastOffset: Long)

/** A finalized per-(user, week) activity row with the new/churned flags
  * `operators.Behavior.churnFinal` rolls up.
  */
case class WeekFlag(user_id: Long, week: java.sql.Date, is_new: Long,
    is_churned: Long)

private case class ChurnSt(weekDays: Long, isNew: Long)

/** One capped in-session event retained by the live path assembler. */
case class PathEv(tsNs: Long, eventId: Long, eventType: String)

/** A completed session's capped path emission. */
case class SessionPath(user_id: Long, path: String)

private case class SessSt(lastNs: Long, lastMs: Long, evs: Seq[PathEv])

/** A user's funnel progression; -1 marks a stage not yet reached. */
case class FunnelTimes(user_id: Long, t1: Long, t2: Long, t3: Long)

private case class FunnelSt(t1: Long, t2: Long, t3: Long)

private case class SessionState(lastNs: Long, pendingNs: Long)

private case class PendingEntry(tsMillis: Long)
private case class LastVisit(day: String)
private case class Seen(first: Boolean)

/** Streaming stateful operators — the reference's CEP/state jobs rebuilt on
  * `flatMapGroupsWithState` with event-time timeouts:
  *
  *  - [[StatefulOps.bounces]]: UserJumpDetailApp's CEP pattern
  *    (`RT/app/dwd/UserJumpDetailApp.java:60-108`): a session entry is a
  *    bounce if the next event within 10 s is also an entry (match path) or
  *    if nothing arrives within 10 s (timeout path). Flink CEP's
  *    matched+timed-out union becomes one state machine: the pending entry
  *    is stored, a 10 s event-time timer is registered, and either a
  *    follow-up event or the timer resolves it.
  *  - [[StatefulOps.uniqueVisits]]: UniqueVisitApp's per-mid daily dedup
  *    with 24 h TTL (`RT/app/dwd/UniqueVisitApp.java:52-90`): ValueState of
  *    last-seen day, evicted by an end-of-day event-time timeout.
  *  - [[StatefulOps.fixNewUserFlags]]: BaseLogApp's is_new fixup
  *    (`RT/app/dwd/BaseLogApp.java:65-92`): first-ever record per mid keeps
  *    is_new=1, later ones are rewritten to 0.
  *
  * Scale design: state is one tiny record per device id, partitioned by the
  * groupByKey shuffle; timeouts bound state growth exactly like the
  * reference's TTL. Each function also works in batch mode (Spark runs
  * flatMapGroupsWithState over a static Dataset with NoTimeout semantics
  * handled by the caller passing sorted groups).
  */
object StatefulOps {

  val BounceWaitMs = 10000L

  /** Streaming bounce detection. Input must carry a watermark on `ts` for
    * the event-time timeout to fire (the reference uses 1 s bounded
    * out-of-orderness; tests mirror that).
    */
  def bounces(logs: Dataset[PageLog]): Dataset[Bounce] = {
    implicit val be = Encoders.product[Bounce]
    implicit val pe = Encoders.product[PendingEntry]
    logs.groupByKey(_.mid)(Encoders.STRING)
      .flatMapGroupsWithState[PendingEntry, Bounce](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (mid, events, state) =>
          val out = Seq.newBuilder[Bounce]
          var pending: Option[Long] = state.getOption.map(_.tsMillis)
          if (state.hasTimedOut) {
            pending.foreach(p => out += Bounce(mid, new Timestamp(p)))
            pending = None
            state.remove()
          } else {
            events.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              pending match {
                case Some(p) if t - p > BounceWaitMs =>
                  out += Bounce(mid, new Timestamp(p))
                  pending = if (e.isEntry) Some(t) else None
                case Some(p) =>
                  if (e.isEntry) { out += Bounce(mid, new Timestamp(p)); pending = Some(t) }
                  else pending = None
                case None =>
                  if (e.isEntry) pending = Some(t)
              }
            }
            pending match {
              case Some(p) =>
                state.update(PendingEntry(p))
                state.setTimeoutTimestamp(p + BounceWaitMs)
              case None => if (state.exists) state.remove()
            }
          }
          out.result().iterator
      }
  }

  /** Streaming sessionization + bounce over the RAW event stream — the
    * stateful twin of the batch `bounce` query (`LogStats`): an event is a
    * session entry when the per-user gap exceeds 30 min; an entry bounces
    * when no event follows within 10 min (follow-up event or event-time
    * timer resolves it). Gap arithmetic uses full-precision nanos exactly
    * like the batch lag/lead formulation, so the emitted bounce set is
    * identical — asserted in `StreamingPipelineSpec` against the real
    * events table.
    */
  def sessionBounces(events: Dataset[RawEvent]): Dataset[UserBounce] = {
    implicit val ue = Encoders.product[UserBounce]
    implicit val se = Encoders.product[SessionState]
    val SessionGapNs = 1800L * 1000000000L
    val WaitNs = 600L * 1000000000L
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, UserBounce](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, evs, state) =>
          val out = Seq.newBuilder[UserBounce]
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, -1L))
          if (state.hasTimedOut) {
            if (st.pendingNs >= 0) out += UserBounce(uid, st.pendingNs)
            state.update(st.copy(pendingNs = -1L))
          } else {
            evs.toSeq.sortBy(e => (e.tsNs, e.event_id)).foreach { e =>
              if (st.pendingNs >= 0 && e.tsNs - st.pendingNs > WaitNs) {
                out += UserBounce(uid, st.pendingNs)
                st = st.copy(pendingNs = -1L)
              } else if (st.pendingNs >= 0) {
                st = st.copy(pendingNs = -1L) // follow-up within wait: no bounce
              }
              val entry = st.lastNs == Long.MinValue || e.tsNs - st.lastNs > SessionGapNs
              if (entry) st = st.copy(pendingNs = e.tsNs)
              st = st.copy(lastNs = e.tsNs)
            }
            state.update(st)
            if (st.pendingNs >= 0)
              state.setTimeoutTimestamp(st.pendingNs / 1000000L + WaitNs / 1000000L + 1)
          }
          out.result().iterator
      }
  }

  /** Streaming unique-visitor dedup: emits the first entry-record per
    * (mid, day); state holds the last seen day with a 24 h event-time TTL.
    */
  def uniqueVisits(logs: Dataset[PageLog]): Dataset[Visit] = {
    implicit val ve = Encoders.product[Visit]
    implicit val le = Encoders.product[LastVisit]
    logs.groupByKey(_.mid)(Encoders.STRING)
      .flatMapGroupsWithState[LastVisit, Visit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (mid, events, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out = Seq.newBuilder[Visit]
            var last: Option[String] = state.getOption.map(_.day)
            var maxTs = 0L
            events.toSeq.sortBy(_.ts.getTime).foreach { e =>
              // reference keeps only session entries with a fresh day
              val dayStr =
                e.ts.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
              maxTs = math.max(maxTs, e.ts.getTime)
              if (e.isEntry && !last.contains(dayStr)) {
                out += Visit(mid, dayStr, e.ts)
                last = Some(dayStr)
              }
            }
            last.foreach { d =>
              state.update(LastVisit(d))
              state.setTimeoutTimestamp(maxTs + 24L * 3600 * 1000) // 24 h TTL
            }
            out.result().iterator
          }
      }
  }

  /** Streaming is_new fixup: passes every record through, rewriting the
    * claimed first-visit flag to false for any mid already seen.
    */
  def fixNewUserFlags(logs: Dataset[FlaggedLog]): Dataset[FlaggedLog] = {
    implicit val oe = Encoders.product[FlaggedLog]
    implicit val se = Encoders.product[Seen]
    logs.groupByKey(_.mid)(Encoders.STRING)
      .flatMapGroupsWithState[Seen, FlaggedLog](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, events, state) =>
          if (state.hasTimedOut) Iterator.empty
          else {
            var seen = state.exists
            val out = events.toSeq.sortBy(_.ts.getTime).map { e =>
              val fixed = e.copy(isNew = if (seen) false else e.isNew)
              seen = true
              fixed
            }
            state.update(Seen(true))
            out.iterator
          }
      }
  }

  /** Streaming exact dedup at INGEST — the LLM-pipeline counterpart of the
    * batch `dedup_exact` query: the first record per content fingerprint
    * passes (earliest (ts, docId) inside a batch, the batch dedup's min-id
    * convention), every later duplicate is dropped by a Seen marker keyed
    * on the fingerprint. State is one boolean per DISTINCT document — at
    * 100 TB that is the dedup index itself, sharded by the groupByKey
    * hash; bound it with an event-time TTL when the dedup window is finite
    * (the [[uniqueVisits]] timeout pattern applies unchanged).
    */
  /** Live transition pairs — the streaming twin of
    * `operators.Behavior.transitionGrid`'s pair extraction. State per user
    * is the LAST event only; each micro-batch (sorted to the batch window
    * order) emits a (src,dst) pair whenever the next event lands within
    * the 30-min session gap. Under the in-order contract the emitted
    * multiset equals the batch lead()-window pairs: consecutive-pair
    * extraction only ever needs one event of look-back, which is exactly
    * the carried state. An event-time timer evicts a user's state once
    * the gap has passed — an in-order successor could no longer pair with
    * it — so live state is bounded by the users ACTIVE within the gap,
    * not the full population. Downstream, `groupBy(src,dst).count` is the
    * same bounded |event_type|² grid as the batch query.
    */
  def transitionPairs(ev: Dataset[PathEvent]): Dataset[Transition] = {
    implicit val te = Encoders.product[Transition]
    implicit val le = Encoders.product[LastEvent]
    val gapNs = graft.operators.Behavior.GapNs
    val gapMs = gapNs / 1000000L
    ev.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, events, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out = Seq.newBuilder[Transition]
            var last = state.getOption
            events.toSeq.sortBy(e => (e.tsNs, e.event_id)).foreach { e =>
              last.foreach { l =>
                if (e.tsNs - l.tsNs <= gapNs) out += Transition(l.eventType, e.event_type)
              }
              last = Some(LastEvent(e.tsNs, e.event_type, e.ts.getTime))
            }
            last.foreach { l =>
              state.update(l)
              state.setTimeoutTimestamp(l.tsMillis + gapMs)
            }
            out.result().iterator
          }
      }
  }

  /** Live funnel progression — the streaming twin of
    * `operators.Behavior.funnelTimes`. State per user is just the three
    * stage entry times (-1 = not reached); each micro-batch's events fold
    * through the SAME strictly-after / 72 h-window step rule the batch
    * query applies to the full sorted array, so under the in-order
    * contract (micro-batches arrive in event-time order per user — the
    * AttributionStream contract) N-batch state ≡ the one-shot fold:
    * the fold is a left fold and (t1,t2,t3) is its entire accumulator,
    * so folding batch k+1 from batch k's end state IS folding the
    * concatenation. Emits the user's progression after every batch that
    * touches it (update mode); fields transition -1 → value at most once,
    * so the final row per user is the per-field max of emitted rows.
    * State: 3 longs per user, bounded by the user population.
    */
  def funnelProgress(ev: Dataset[StageEvent]): Dataset[FunnelTimes] = {
    implicit val fe = Encoders.product[FunnelTimes]
    implicit val se = Encoders.product[FunnelSt]
    val W = graft.operators.Behavior.FunnelWindowNs
    ev.groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState[FunnelSt, FunnelTimes](GroupStateTimeout.NoTimeout) {
        case (uid, events, state) =>
          var s = state.getOption.getOrElse(FunnelSt(-1L, -1L, -1L))
          // within-batch order matches the batch sort_array struct order
          events.toSeq.sortBy(e => (e.tsNs, e.stage)).foreach { e =>
            s =
              if (e.stage == 1 && s.t1 < 0) s.copy(t1 = e.tsNs)
              else if (e.stage == 2 && s.t1 >= 0 && s.t2 < 0 &&
                e.tsNs > s.t1 && e.tsNs <= s.t1 + W) s.copy(t2 = e.tsNs)
              else if (e.stage == 3 && s.t2 >= 0 && s.t3 < 0 &&
                e.tsNs > s.t2 && e.tsNs <= s.t1 + W) s.copy(t3 = e.tsNs)
              else s
          }
          state.update(s)
          FunnelTimes(uid, s.t1, s.t2, s.t3)
      }
  }

  private def dateOf(epochDay: Long): java.sql.Date =
    java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(epochDay))

  /** A timer timestamp that Spark will accept: event-time timeouts must be
    * strictly ahead of the current watermark, and a user whose activity is
    * far in the past relative to the GLOBAL watermark (exactly the churned
    * case) would otherwise fail the set. Clamping forward only delays the
    * firing by one batch; the emitted flags are unchanged.
    */
  private def safeTimeout(state: GroupState[_], ts: Long): Long =
    math.max(ts, state.getCurrentWatermarkMs() + 1)

  /** Live distinct (day, user) activity — the streaming twin of
    * `rolling_actives`' `.distinct()` frame. Emits each (user, day) pair
    * exactly once; feeding the emissions into
    * `operators.Behavior.rollingActive` reproduces the batch DAU/WAU grid.
    *
    * State: ONE long per user (the last activity day) — under the in-order
    * contract a day can only repeat while it is still the latest, so
    * "newer than the last emitted day" is the whole dedup test. An
    * event-time timer two days past the last activity evicts the state:
    * in-order, a day that old can no longer reappear, so live state is
    * bounded by the users active in the last two days, not the population.
    */
  def firstDailyActivity(ev: Dataset[DayEvent]): Dataset[DayUser] = {
    implicit val de = Encoders.product[DayUser]
    implicit val se = Encoders.product[LastDaySt]
    val dayMs = 86400000L
    ev.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[LastDaySt, DayUser](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, _, state) if state.hasTimedOut =>
          state.remove(); Iterator.empty
        case (uid, events, state) =>
          val out = Seq.newBuilder[DayUser]
          var last = state.getOption.map(_.epochDay).getOrElse(Long.MinValue)
          events.map(_.day.toLocalDate.toEpochDay).toSeq.distinct.sorted
            .foreach { d =>
              if (d > last) { out += DayUser(uid, dateOf(d)); last = d }
            }
          state.update(LastDaySt(last))
          state.setTimeoutTimestamp(safeTimeout(state, (last + 2) * dayMs))
          out.result().iterator
      }
  }

  /** Live cohort-cell membership — the streaming twin of
    * `cohort_retention`'s per-user explode. Under the in-order contract the
    * FIRST event seen is the user's earliest, so its week is the cohort;
    * each later distinct week emits the user's (cohort, offset) cell at
    * most once. Counting emissions per (cohort_week, offset_w) and applying
    * `operators.Behavior.cohortFinal` reproduces the batch matrix.
    *
    * State: TWO longs per user (cohort week + last emitted offset) — weeks
    * arrive nondecreasing, so the emitted-offset set never needs
    * materializing. Cohort membership is definitionally forever, so there
    * is no timer; state is 16 bytes × the user population, the same bound
    * as the reference's UV-dedup ValueState, with an optional TTL at the
    * analysis horizon if the cohort window is finite.
    */
  def cohortCells(ev: Dataset[WeekEvent]): Dataset[CohortCell] = {
    implicit val ce = Encoders.product[CohortCell]
    implicit val se = Encoders.product[CohortSt]
    ev.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[CohortSt, CohortCell](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, events, state) =>
          val out = Seq.newBuilder[CohortCell]
          var st = state.getOption
          events.map(_.week.toLocalDate.toEpochDay).toSeq.distinct.sorted
            .foreach { wd =>
              st match {
                case None =>
                  out += CohortCell(uid, dateOf(wd), 0L)
                  st = Some(CohortSt(wd, 0L))
                case Some(s) =>
                  val off = (wd - s.cohortDays) / 7
                  if (off > s.lastOffset) {
                    out += CohortCell(uid, dateOf(s.cohortDays), off)
                    st = Some(s.copy(lastOffset = off))
                  }
              }
            }
          st.foreach(state.update)
          out.result().iterator
      }
  }

  /** Live weekly churn flags — the streaming twin of `weekly_churn`'s
    * lag/lead window. A week's row becomes final when either the user's
    * next distinct week arrives (is_churned = successor ≠ week+7) or an
    * event-time timer two weeks past the week start fires with no
    * successor (is_churned = 1 — in-order, a consecutive-week event would
    * have arrived before the watermark passed it). is_new is decided at
    * week entry from the carried previous week. A timeout also clears the
    * state, which stays correct for later reappearances: a user returning
    * after a fired timer cannot be returning in the consecutive week, so
    * the fresh-state is_new=1 matches the batch lag test.
    *
    * Emitting the (week, is_new, is_churned) FLAGS rather than raw
    * prev/next pointers is what makes the timeout path exact: the flags
    * only encode "was the neighbor the adjacent week", which eviction
    * preserves. `operators.Behavior.churnFinal` over the emissions
    * reproduces the batch rollup.
    *
    * State: TWO longs + one timer per user active within the 2-week churn
    * horizon — evicted beyond it, so live state is bounded by recent
    * actives, not the population.
    */
  def weeklyChurnFlags(ev: Dataset[WeekEvent]): Dataset[WeekFlag] = {
    implicit val we = Encoders.product[WeekFlag]
    implicit val se = Encoders.product[ChurnSt]
    val dayMs = 86400000L
    ev.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[ChurnSt, WeekFlag](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, _, state) if state.hasTimedOut =>
          val s = state.get
          state.remove()
          Iterator.single(WeekFlag(uid, dateOf(s.weekDays), s.isNew, 1L))
        case (uid, events, state) =>
          val out = Seq.newBuilder[WeekFlag]
          var st = state.getOption
          events.map(_.week.toLocalDate.toEpochDay).toSeq.distinct.sorted
            .foreach { wd =>
              st match {
                case Some(s) if wd > s.weekDays =>
                  val adjacent = wd == s.weekDays + 7
                  out += WeekFlag(uid, dateOf(s.weekDays), s.isNew,
                    if (adjacent) 0L else 1L)
                  st = Some(ChurnSt(wd, if (adjacent) 0L else 1L))
                case Some(_) => // same week again — no-op
                case None =>
                  st = Some(ChurnSt(wd, 1L))
              }
            }
          st.foreach { s =>
            state.update(s)
            state.setTimeoutTimestamp(
              safeTimeout(state, (s.weekDays + 14) * dayMs))
          }
          out.result().iterator
      }
  }

  /** Live session-path assembly — the streaming twin of
    * `session_paths`' gaps-and-islands window. A session completes when
    * either an event past the 30-min gap arrives (it opens the next
    * session) or an event-time timer one gap past the last event fires
    * (in-order, nothing can extend the session once the watermark passed
    * that point — the same argument as the bounce CEP timeout). Counting
    * the emitted paths reproduces the batch path grid.
    *
    * State is CAPPED exactly like the batch query: only the first
    * [[graft.operators.Behavior]] PathCap (24) events of a session are
    * retained (the gap test still advances on every event, so a whale
    * session neither grows state nor splits early) — ≤24 small rows +
    * 2 longs + a timer per gap-active user, the same bound the batch
    * side enforces BEFORE its assembly shuffle.
    */
  def sessionPaths(ev: Dataset[PathEvent]): Dataset[SessionPath] = {
    implicit val pe = Encoders.product[SessionPath]
    implicit val se = Encoders.product[SessSt]
    val gapNs = graft.operators.Behavior.GapNs
    val gapMs = gapNs / 1000000L
    val cap = graft.operators.Behavior.PathCap
    def pathOf(evs: Seq[PathEv]): String = evs.map(_.eventType).mkString("->")
    ev.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessSt, SessionPath](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, _, state) if state.hasTimedOut =>
          val s = state.get
          state.remove()
          Iterator.single(SessionPath(uid, pathOf(s.evs)))
        case (uid, events, state) =>
          val out = Seq.newBuilder[SessionPath]
          var st = state.getOption
          events.toSeq.sortBy(e => (e.tsNs, e.event_id)).foreach { e =>
            val pe = PathEv(e.tsNs, e.event_id, e.event_type)
            st = st match {
              case Some(s) if e.tsNs - s.lastNs <= gapNs =>
                Some(SessSt(e.tsNs, e.ts.getTime,
                  if (s.evs.length < cap) s.evs :+ pe else s.evs))
              case Some(s) =>
                out += SessionPath(uid, pathOf(s.evs))
                Some(SessSt(e.tsNs, e.ts.getTime, Seq(pe)))
              case None =>
                Some(SessSt(e.tsNs, e.ts.getTime, Seq(pe)))
            }
          }
          st.foreach { s =>
            state.update(s)
            state.setTimeoutTimestamp(safeTimeout(state, s.lastMs + gapMs))
          }
          out.result().iterator
      }
  }

  def dedupeStream(recs: Dataset[DocRecord]): Dataset[DocRecord] = {
    implicit val de = Encoders.product[DocRecord]
    implicit val se = Encoders.product[Seen]
    recs.groupByKey(_.fp)(Encoders.STRING)
      .flatMapGroupsWithState[Seen, DocRecord](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, events, state) =>
          if (state.hasTimedOut) Iterator.empty
          else {
            val out =
              if (state.exists) Iterator.empty
              else Iterator.single(events.minBy(e => (e.ts.getTime, e.docId)))
            state.update(Seen(true))
            out
          }
      }
  }
}
