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
  /** Per-user state: ALL sessions the watermark has not yet sealed, in
    * start order. Holding only the latest would force gap-closed
    * sessions to emit immediately — and an in-watermark straggler
    * arriving a batch later could then never merge into them. */
  case class OpenSessions(items: List[OpenSession])
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
    * over (UNSEALED sessions ∪ batch events): events within a gap of a
    * held session extend it, straggler chains more than a gap older merge
    * among THEMSELVES into late sessions (and bridge into held sessions
    * when they reach within a gap of one). A gap-closed session is NOT
    * emitted while the watermark could still admit a merging straggler —
    * it stays in state until wm > its end + gap (emitting on gap-close
    * alone would let a batch-2 in-watermark straggler open an OVERLAPPING
    * session next to the already-emitted one). Only events later than the
    * watermark delay cannot be merged retroactively — the standard
    * append-mode limitation. Feed a time-ordered source for exact batch
    * parity.
    *
    * @param events streaming DF with user_id, a TimestampType `ts` (must
    *               carry a watermark), event_id
    */
  def sessionize(events: DataFrame, gapMinutes: Int): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000000
    events
      .select($"user_id".cast("long").as("user_id"), $"ts",
        // loud null-ts guard (the batch ops/Sessionize posture): a NULL
        // would otherwise die as a cryptic non-nullable-encoder crash on
        // the primitive ts_us field
        unix_micros(when($"ts".isNull, raise_error(lit(
          "Stateful.sessionize: NULL ts cannot be ordered into a session")))
          .otherwise($"ts")).as("ts_us"),
        $"event_id".cast("long").as("event_id"))
      .as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSessions, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, rows, state) =>
          val gap = gapUs
          // a session is SEALED once no in-time event can merge into it:
          // every mergeable ts_us <= end_us + gap is below the watermark.
          // Exact µs compare — the ms-floored `deadlineMs <= wm` it
          // replaces sealed one tick early when end+gap landed inside the
          // watermark's own millisecond (an in-time event at that very µs
          // could still legally merge; st9's oracle pins the strict ms
          // compare this reduces to)
          def sealed_(s: OpenSession, wm: Long): Boolean = s.end_us + gap < wm * 1000
          def deadlineMs(s: OpenSession): Long = (s.end_us + gap) / 1000
          // persist the unsealed remainder + arm the EARLIEST deadline.
          // The timer must be strictly ahead of the watermark (Spark
          // rejects earlier); a deadline AT the watermark arms wm+1 — if
          // the drain ends before the watermark moves again the session
          // stays unemitted, exactly the sessions st9's strict-compare
          // oracle excludes.
          def persist(keep: List[OpenSession], wm: Long): Unit =
            if (keep.isEmpty) { if (state.exists) state.remove() }
            else {
              state.update(OpenSessions(keep))
              state.setTimeoutTimestamp(math.max(keep.map(deadlineMs).min, wm + 1))
            }
          val wm = state.getCurrentWatermarkMs()
          if (state.hasTimedOut) {
            val (due, keep) = state.get.items.partition(sealed_(_, wm))
            persist(keep, wm)
            due.iterator.map(s => ClosedSession(uid, s.start_us, s.end_us, s.n_events))
          } else {
            // eager fold (state mutations must not hide inside a lazy
            // iterator): a gaps-and-islands INTERVAL merge over the held
            // sessions plus the batch's events, in start order — exactly
            // what batch semantics compute over everything still
            // mergeable. Folding events against a single open session
            // (the original shape) emitted straggler chains as
            // overlapping singletons; emitting on gap-close (the second
            // shape) orphaned stragglers that arrived a batch later.
            val carried = state.getOption.map(_.items).getOrElse(Nil)
            val merged = scala.collection.mutable.ArrayBuffer.empty[OpenSession]
            (carried ++ rows.map(e => OpenSession(e.ts_us, e.ts_us, 1L)))
              .sortBy(s => (s.start_us, s.end_us))
              .foreach { it =>
                merged.lastOption match {
                  case Some(c) if it.start_us - c.end_us <= gap =>
                    // end via max, never assignment: a carried interval
                    // may extend past later-starting items it absorbs
                    merged(merged.size - 1) = OpenSession(c.start_us,
                      math.max(c.end_us, it.end_us), c.n_events + it.n_events)
                  case _ => merged += it
                }
              }
            val (due, keep) = merged.toList.partition(sealed_(_, wm))
            persist(keep, wm)
            due.iterator.map(s => ClosedSession(uid, s.start_us, s.end_us, s.n_events))
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
      // isNull must trip the guard too: (NULL < 0) is NULL, which skips
      // the raise branch and dies later as a cryptic non-nullable-encoder
      // crash on the primitive value_e4 field
      floor(when($"value".isNull || $"value" < 0, raise_error(lit(
        "typeProfile requires non-negative, non-NULL event values: the " +
          "emitted running total is max()-folded downstream and must be monotone")))
        .otherwise($"value") * 10000).cast("long").as("value_e4"))
      .as[TypedEvent]
      .groupByKey(_.user_id)
      .transformWithState(
        new TypeProfileProcessor, TimeMode.None(), OutputMode.Update())
  }
}
