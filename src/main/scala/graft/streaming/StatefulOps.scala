package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Arbitrary-state streaming (SURVEY §2.10 C4's strong form): the
  * reference keeps custom progress state across pages — `page_num` and a
  * seen-set carried between scrape rounds (`/root/reference/
  * web_scrpaer_2.py:246-281`) — which is MORE than a windowed
  * aggregation: it is user-defined state evolved by user code. The Spark
  * analogue is `KeyValueGroupedDataset.flatMapGroupsWithState`, used
  * here for per-user running totals whose state (event count, value
  * cents) is updated by arbitrary Scala per micro-batch.
  *
  * Scale stance: state lives in the state store partitioned by user_id
  * (RocksDB-backed on a cluster), one entry per user; each micro-batch
  * shuffles only its own rows. Rounding to cents happens in the
  * DataFrame (Spark SQL `round`) BEFORE entering typed code, so the
  * value the state fold sees is the exact long the DuckDB oracle
  * computes — no JVM-vs-SQL rounding divergence.
  */
object StatefulOps {

  /** One output row per (user, micro-batch) with the running totals. */
  case class UserAgg(user_id: Long, n_events: Long, value_cents: Long)

  /** Streaming per-user running totals with custom state. Update-mode
    * output: each micro-batch emits the refreshed totals for the users
    * it touched. */
  def userRunningTotals(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = EventStreams.eventsStream(s, dir)
      .select(col("user_id"),
        coalesce(round(col("value") * 100).cast("long"), lit(0L)).as("cents"))
      .as[(Long, Long)]
    ev.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), UserAgg](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[(Long, Long)]) =>
          var (n, cents) = state.getOption.getOrElse((0L, 0L))
          rows.foreach { case (_, c) => n += 1; cents += c }
          state.update((n, cents))
          Iterator(UserAgg(user, n, cents))
      }
      .toDF()
  }

  /** Declared-query form (`c4_stateful_totals`): drain the throttled
    * stream, then keep each user's LAST update — n_events strictly
    * increases per user, so the max-count row is the final state. The
    * DuckDB oracle is the plain batch aggregation: proof that arbitrary
    * streaming state converges to the batch answer once the source is
    * drained (the reference's resumed-scrape == full-scrape property). */
  def c4StatefulTotals(s: SparkSession, dir: String): DataFrame = {
    val name = StreamTune.withDrainWidthFrom(s,
        java.nio.file.Paths.get(dir, "events.parquet")) {
      EventStreams.drainToTable(s, userRunningTotals(s, dir),
        s"c4_state_${System.nanoTime()}", "update")
    }
    val w = Window.partitionBy("user_id").orderBy(col("n_events").desc)
    s.table(name)
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
      .orderBy("user_id")
  }

  /** One emitted row per observed transition. */
  case class Transition(from_type: String, to_type: String)

  /** E51 streaming: incremental transition mining with LAST-EVENT state.
    * Where the batch form (EventOps.e51EventTransitions) sorts each
    * user's whole history in one window pass, the streaming form holds
    * exactly ONE row of state per user — the (ts_us, event_id, type) of
    * the last event seen — and emits a transition per arriving event:
    * the state-bound contrast to e1s's grow-forever seen-set and e1sb's
    * watermark-evicted variant. State never grows with history length,
    * only with the user population.
    *
    * Ordering contract: a micro-batch's group iterator is UNORDERED, so
    * the batch's rows are sorted by (ts, event_id) inside the fold;
    * ACROSS batches the time-bucketed landing replays disjoint
    * time-ordered ranges (the e29 protocol), so the carried state is
    * always the true predecessor and the drained transitions equal the
    * batch window's — which is exactly what the shared oracle checks. */
  def userTransitions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = EventStreams.eventsStreamBucketed(s, dir, 6, 3)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .as[(Long, Long, Long, String)]
    ev.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, String), Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[(Long, Long, Long, String)],
         state: GroupState[(Long, Long, String)]) =>
          val sorted = rows.toSeq.sortBy(r => (r._3, r._2))
          var prev = state.getOption // (ts_us, event_id, type) of the last event
          val out = Seq.newBuilder[Transition]
          sorted.foreach { case (_, id, ts, typ) =>
            prev.foreach(p => out += Transition(p._3, typ))
            prev = Some((ts, id, typ))
          }
          prev.foreach(state.update)
          out.result().iterator
      }
      .toDF()
  }

  /** Declared-query form (`e51s_transitions_stream`): drain the
    * append-mode transition rows, then aggregate batch-side to the SAME
    * shape — and the same DuckDB oracle — as the batch key e51: the
    * incremental path must converge to the full-history answer. */
  def e51sTransitionsStream(s: SparkSession, dir: String): DataFrame = {
    val name = StreamTune.withDrainWidthFrom(s,
        java.nio.file.Paths.get(dir, "events.parquet")) {
      EventStreams.drainToTable(s, userTransitions(s, dir),
        "e51s_trans_table", "append")
    }
    s.table(name)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      .withColumn("p_to", round(
        col("n") / sum("n").over(Window.partitionBy("from_type")), 6))
      .orderBy("from_type", "to_type")
  }
}
