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
    * In-watermark late events merge by a gaps-and-islands interval fold
    * over (open session ∪ batch events): events within a gap of the open
    * session extend it, straggler chains more than a gap older merge
    * among THEMSELVES into late sessions (and bridge into the open
    * session when they reach within a gap of it). Only late events whose
    * session already closed and was emitted cannot be merged
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
            // iterator): a gaps-and-islands INTERVAL merge over the
            // carried open session plus the batch's events, in start
            // order — exactly what batch semantics compute over
            // everything still mergeable. Folding events one-by-one
            // against the open session alone (the previous shape) emitted
            // each in-watermark straggler as its own single-event
            // session, so two stragglers within a gap of EACH OTHER
            // produced overlapping "sessions" that violated the gap
            // partitioning; the interval fold merges straggler chains —
            // and bridges them into the open session when they reach
            // within a gap of it.
            val sorted = rows.toArray.sortBy(e => (e.ts_us, e.event_id))
            val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            val items: Iterator[OpenSession] = state.getOption match {
              case Some(s) =>
                // two sorted runs merged in start order: events before the
                // carried interval's start, the interval, then the rest
                val (before, after) = sorted.partition(_.ts_us < s.start_us)
                before.iterator.map(e => OpenSession(e.ts_us, e.ts_us, 1L)) ++
                  Iterator.single(s) ++
                  after.iterator.map(e => OpenSession(e.ts_us, e.ts_us, 1L))
              case None =>
                sorted.iterator.map(e => OpenSession(e.ts_us, e.ts_us, 1L))
            }
            var open: Option[OpenSession] = None
            items.foreach { it =>
              open match {
                case Some(c) if it.start_us - c.end_us <= gapUs =>
                  // end via max, never assignment: the carried interval
                  // may extend past later-starting items it absorbs
                  open = Some(OpenSession(c.start_us,
                    math.max(c.end_us, it.end_us), c.n_events + it.n_events))
                case Some(c) =>
                  closed += ClosedSession(uid, c.start_us, c.end_us, c.n_events)
                  open = Some(it)
                case None =>
                  open = Some(it)
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
    * emits the key's FULL refreshed breakdown; counts are monotone by
    * construction and the value total is monotone because typeProfile
    * rejects negative values at ingress (raise_error), so max() per
    * (user, type) downstream yields final state under any batch split —
    * the same multi-batch-safe shape as st8.
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
      // fold the batch into a LOCAL map first, then one store read +
      // write per touched type: per-row containsKey/getValue/updateValue
      // against the RocksDB-backed MapState would cost ~3 point ops per
      // event on the stateful hot path (a hot key's 10k-event batch is
      // 10 store ops this way, not 30k)
      var t = if (total.exists()) total.get() else 0L
      val delta = scala.collection.mutable.HashMap.empty[String, Long]
      rows.foreach { e =>
        delta.update(e.event_type, delta.getOrElse(e.event_type, 0L) + 1L)
        t += e.value_e4
      }
      delta.foreach { case (typ, d) =>
        val c = if (counts.containsKey(typ)) counts.getValue(typ) else 0L
        counts.updateValue(typ, c + d)
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
    // the downstream max()-fold (st12, StreamingSpec) relies on BOTH
    // emitted measures being monotone: counts are by construction, but
    // the running value total is only monotone for NON-NEGATIVE values —
    // a refund-style negative value would make max() silently pick a
    // stale intermediate total. Enforce the contract loudly at ingress
    // (the e8/ANSI-abort posture: corrupt input fails the job, never
    // bends the result).
    events.select($"user_id".cast("long").as("user_id"), $"event_type",
      floor(when($"value" < 0, raise_error(lit(
        "typeProfile requires non-negative event values: the emitted " +
          "running total is max()-folded downstream and must be monotone")))
        .otherwise($"value") * 10000).cast("long").as("value_e4"))
      .as[TypedEvent]
      .groupByKey(_.user_id)
      .transformWithState(
        new TypeProfileProcessor, TimeMode.None(), OutputMode.Update())
  }
}
