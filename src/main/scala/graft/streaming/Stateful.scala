package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.GroupStateTimeout

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
}
