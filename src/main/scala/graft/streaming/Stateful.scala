package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  GroupStateTimeout, MapState, OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Typed arbitrary-state streaming (SURVEY §2.9 ST5's
  * `(flatMap)GroupsWithState` option; reference session logic:
  * transform_clickstream.py:47-126): a per-user running profile kept in
  * the state store across micro-batches.
  *
  * Scale notes: state is one small record per user key, partitioned by
  * the stream's key shuffle — the state store scales horizontally with
  * executors. Unbounded key spaces need a timeout
  * (`GroupStateTimeout.EventTimeTimeout` + watermark) so idle keys age
  * out; this profile op keeps NoTimeout because the user dimension is
  * bounded. mapGroupsWithState requires update output mode — each
  * micro-batch emits the refreshed profile for the keys it touched.
  */
object Stateful {

  case class UserEvent(user_id: Long, event_type: String)
  case class UserState(n_events: Long, purchases: Long)
  case class UserProfile(user_id: Long, n_events: Long, purchases: Long)

  // carries the watermarked TIMESTAMP column through the typed boundary —
  // projecting it away would drop the watermark EventTimeTimeout needs
  case class SessEvent(
      user_id: Long, ts: java.sql.Timestamp, ts_us: Long, event_id: Long)
  case class OpenSession(start_us: Long, end_us: Long, n_events: Long)
  case class ClosedSession(
      user_id: Long, session_start_us: Long, session_end_us: Long, n_events: Long)

  /** TRUE streaming sessionization — the cross-batch stateful option the
    * reference's batch-local lag+cumsum cannot express (SURVEY ST5;
    * transform_clickstream.py:47-126 splits sessions at micro-batch
    * boundaries). One open session per user lives in the state store;
    * events extend it, a gap closes and emits it, and an EVENT-TIME
    * timeout (watermark passing end + gap) closes idle sessions without
    * waiting for the user's next event. State is O(users), partitioned by
    * the key shuffle.
    *
    * In-watermark late events that still belong to the OPEN session
    * (within the gap of its bounds) merge into it (min/max bounds); late
    * events more than a gap older than the open session's start are
    * emitted as their own single-event late sessions, and late events
    * whose session already closed and was emitted cannot be merged
    * retroactively — the standard append-mode limitation, bounded by the
    * watermark delay. Feed a time-ordered source for exact batch parity.
    *
    * @param events streaming DF with user_id, a TimestampType `ts` (must
    *               carry a watermark), event_id
    */
  def sessionize(events: DataFrame, gapMinutes: Int): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000000
    events
      .select($"user_id".cast("long").as("user_id"), $"ts",
        unix_micros($"ts").as("ts_us"), $"event_id".cast("long").as("event_id"))
      .as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, rows, state) =>
          if (state.hasTimedOut) {
            // watermark passed end + gap: no in-time event can extend it
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(uid, s.start_us, s.end_us, s.n_events))
          } else {
            // eager fold (state mutations must not hide inside a lazy
            // iterator): extend/close against the carried open session
            val sorted = rows.toArray.sortBy(e => (e.ts_us, e.event_id))
            val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            var open: Option[OpenSession] = state.getOption
            sorted.foreach { e =>
              open match {
                case Some(s) if e.ts_us < s.start_us - gapUs =>
                  // in-watermark straggler more than a gap OLDER than the
                  // open session: batch semantics would place it in an
                  // earlier (already emitted) session, so emit it as its
                  // own late session instead of merging it into a session
                  // it is separated from by more than the gap
                  closed += ClosedSession(uid, e.ts_us, e.ts_us, 1L)
                case Some(s) if e.ts_us - s.end_us <= gapUs =>
                  // min/max, not assignment: a late-but-in-watermark event
                  // from a later batch may precede the open session's
                  // bounds — regressing end_us would misread the next
                  // delta and emit end < contained-event timestamps
                  open = Some(s.copy(
                    start_us = math.min(s.start_us, e.ts_us),
                    end_us = math.max(s.end_us, e.ts_us),
                    n_events = s.n_events + 1))
                case Some(s) =>
                  closed += ClosedSession(uid, s.start_us, s.end_us, s.n_events)
                  open = Some(OpenSession(e.ts_us, e.ts_us, 1L))
                case None =>
                  open = Some(OpenSession(e.ts_us, e.ts_us, 1L))
              }
            }
            // persist the still-open session + arm its event-time timeout.
            // If the natural deadline already trails the watermark (late
            // data opened or extended an already-expired session), CLOSE
            // it here instead of arming a timer: late events never advance
            // the watermark, so a wm+1 timer armed by the FINAL batch of a
            // drain would never fire and the session would be lost. No
            // in-time event can merge into it anyway (its ts > watermark >
            // end + gap), so emitting now equals what the timeout branch
            // would do one tick later.
            open.foreach { s =>
              val deadlineMs = (s.end_us + gapUs) / 1000
              if (deadlineMs <= state.getCurrentWatermarkMs()) {
                closed += ClosedSession(uid, s.start_us, s.end_us, s.n_events)
                if (state.exists) state.remove()
              } else {
                state.update(s)
                state.setTimeoutTimestamp(deadlineMs)
              }
            }
            closed.iterator
          }
      }
  }

  /** Running (event count, purchase count) per user, maintained in typed
    * state. After draining all input, the emitted profiles equal the
    * batch groupBy — the property the oracle checks. */
  def userProfile(events: DataFrame): Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    events.select($"user_id".cast("long").as("user_id"), $"event_type")
      .as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserProfile](GroupStateTimeout.NoTimeout) {
        (uid, rows, state) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0L))
          var n = prev.n_events
          var p = prev.purchases
          rows.foreach { e =>
            n += 1
            if (e.event_type == "purchase") p += 1
          }
          state.update(UserState(n, p))
          UserProfile(uid, n, p)
      }
  }

  case class TypedEvent(user_id: Long, event_type: String, value_e4: Long)
  case class TypeProfile(
      user_id: Long, event_type: String, n_events: Long, user_value_e4: Long)

  /** Spark 4 `transformWithState` processor (the successor API to
    * (flatMap|map)GroupsWithState; SPARK-40434 "arbitrary stateful
    * processing v2"): a per-user event-type breakdown held in composite
    * state — a MapState (per-type counts: point lookups and updates, NOT
    * a serialized blob like GroupState, so a hot user with many types
    * only touches the entries its batch hits) plus a ValueState (running
    * value total). Requires the RocksDB state-store provider. Each batch
    * emits the key's FULL refreshed breakdown; counts are monotone, so
    * max() per (user, type) downstream yields final state under any
    * batch split — the same multi-batch-safe shape as st8.
    */
  private class TypeProfileProcessor
      extends StatefulProcessor[Long, TypedEvent, TypeProfile] {
    @transient private var counts: MapState[String, Long] = _
    @transient private var total: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long](
        "type_counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      total = getHandle.getValueState[Long](
        "value_total", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long, rows: Iterator[TypedEvent],
        timerValues: TimerValues): Iterator[TypeProfile] = {
      var t = if (total.exists()) total.get() else 0L
      rows.foreach { e =>
        val c = if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L
        counts.updateValue(e.event_type, c + 1L)
        t += e.value_e4
      }
      total.update(t)
      // materialize before returning: state reads must not hide inside a
      // lazily-consumed iterator (same rule as sessionize's eager fold)
      counts.iterator().map { case (typ, n) => TypeProfile(key, typ, n, t) }
        .toArray.iterator
    }
  }

  /** Per-user per-event-type running profile via `transformWithState`.
    * Caller must run with the RocksDB state-store provider (the only
    * provider implementing the v2 state API). */
  def typeProfile(events: DataFrame): Dataset[TypeProfile] = {
    import events.sparkSession.implicits._
    events.select($"user_id".cast("long").as("user_id"), $"event_type",
      floor($"value" * 10000).cast("long").as("value_e4"))
      .as[TypedEvent]
      .groupByKey(_.user_id)
      .transformWithState(
        new TypeProfileProcessor, TimeMode.None(), OutputMode.Update())
  }
}
