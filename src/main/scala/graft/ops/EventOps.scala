package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Event-time operators over the `events` table (SURVEY.md §2.10 E4-E5).
  * Batch forms here; the Structured Streaming forms (withWatermark) live in
  * graft.streaming.EventStreams and are asserted equal to these in tests.
  */
object EventOps {

  /** E4: event-time tumbling window aggregation. Window start is emitted as
    * epoch seconds (BIGINT) so the oracle compare is precision-agnostic
    * (the raw parquet timestamps are ns; Spark reads µs). Money summed as
    * exact integer cents — order-independent, hash-stable. */
  def e4TimeWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(
        unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("value_cents"))
      .orderBy("win_start", "event_type")

  /** E5: sessionization — session_window with a 30-minute gap. A session's
    * start is its first event's timestamp (floored to seconds for the
    * compare). Semantics: an event joins the session iff ts < prev_ts + gap
    * (strictly), matching the gaps-and-islands oracle. State is partitioned
    * by user_id, so it scales horizontally with users. */
  def e5SessionWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("user_id"),
        unix_timestamp(col("session_window.start")).as("sess_start"),
        col("n"))
      .orderBy("user_id", "sess_start")

  /** E18: distinct-count SKETCH — `approx_count_distinct` (HyperLogLog++,
    * fixed 2^p-register state per group, partial-aggregable) beside the
    * exact `count(distinct)`, which shuffles every distinct key. At
    * 100 TB cardinality estimation runs the sketch; this key gates its
    * CONTRACT: the estimate must land within 5 standard errors of the
    * exact count (rsd = 0.02 → ±10%, P(miss) < 1e-6), with an absolute
    * floor of 10 for tiny groups where relative error is meaningless.
    * DuckDB independently recomputes the exact side and asserts
    * `hll_ok`; an out-of-bound estimate fails the hash compare. */
  def e18DistinctSketch(s: SparkSession, d: String): DataFrame = {
    val rsd = 0.02
    events(s, d)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), rsd).as("approx_users"))
      .select(col("event_type"), col("n_events"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <=
          greatest(col("exact_users") * (5 * rsd), lit(10.0))).as("hll_ok"))
      .orderBy("event_type")
  }
}
