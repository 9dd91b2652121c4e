package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance for self-maintainable
  * aggregates (count + sum — the algebra behind DLT/materialized-view
  * incremental refresh). The reference keeps its gold rollups fresh by
  * full recompute per run (gold/create_gold_tables.py aggregates the
  * whole silver table each time); maintaining the view from the change
  * feed instead makes the refresh cost proportional to the CHANGES, not
  * the table — the difference between re-scanning 100 TB and shuffling a
  * few MB of CDF rows.
  *
  * State schema: group keys ++ (`cnt` BIGINT, `agg_sum` DECIMAL). Sums are
  * decimal-exact so repeated deltas can never drift from a full recompute
  * (a double accumulator would — order-dependent ulps compound per batch).
  */
object IncrementalAgg {

  /** Full initial aggregate over a snapshot (the view's seed state). */
  def init(snapshot: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    snapshot.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("cnt"),
        sum(col(valueCol).cast("decimal(18,2)")).as("agg_sum"))

  /** Fold one change-feed batch into the aggregate state: inserts and
    * update postimages add, deletes and update preimages subtract (an
    * update's ±1 counts cancel; its sum delta is post − pre). One
    * group-by over the (feed-sized) delta plus one keyed join against
    * the state — only changed groups shuffle. Groups whose count reaches
    * zero drop out of the view, exactly like a recompute would drop them.
    */
  def applyDelta(state: DataFrame, feed: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame = {
    val sign =
      when(col(ChangeFeed.ChangeTypeCol).isin("insert", "update_postimage"), lit(1L))
        .when(col(ChangeFeed.ChangeTypeCol).isin("delete", "update_preimage"), lit(-1L))
        .otherwise(lit(0L))
    val delta = feed
      .withColumn("_sign", sign)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("_sign")).as("_dcnt"),
        sum(col("_sign") * col(valueCol).cast("decimal(18,2)")).as("_dsum"))
    state.join(delta, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("_dcnt"), lit(0L))).as("cnt"),
        // closed output type (init's sum type): repeated applyDelta /
        // parquet-state roundtrips must not grow decimal precision
        (coalesce(col("agg_sum"), lit(0).cast("decimal(18,2)")) +
          coalesce(col("_dsum"), lit(0).cast("decimal(18,2)")))
          .cast("decimal(28,2)").as("agg_sum")): _*)
      .filter(col("cnt") > 0)
  }
}
