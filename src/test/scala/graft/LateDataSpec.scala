package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** E4l — watermark DROP semantics under an out-of-order replay. The
  * in-order parity specs (e4b/e5b) can never exercise the drop path:
  * their buckets arrive in timeline order, so no row is ever behind
  * the watermark. Here buckets replay as 0,2,4,1,3,5 — buckets 1 and 3
  * land after the watermark has advanced past them — and the spec
  * asserts three things: rows were REALLY dropped (query progress
  * metrics, not inference), the drained append-mode output equals a
  * batch recompute of Spark's exact drop/emit rule, and that recompute
  * differs from the naive full aggregation (i.e. the key demonstrates
  * something e4b does not). */
class LateDataSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("e4l: late rows are dropped by the watermark and output matches the drop rule") {
    val name = "e4l_spec_table"
    val q = EventStreams.e4lPipeline(spark, sf).writeStream
      .format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation", s"/tmp/graft-ckpt-$name-${System.nanoTime()}")
      .start()
    try q.processAllAvailable() finally q.stop()

    // 1. the runtime itself reports dropped rows — the drop is real,
    //    not an artifact of the batch model below
    val dropped = q.recentProgress
      .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
    assert(dropped > 0, "expected the watermark to drop late rows")

    // 2. batch recompute of Spark's exact rule. Bucket boundaries use
    //    the staging's own integer-division arithmetic; the watermark
    //    before replay position p is the ms-truncated max event time
    //    over positions < p minus the 10-minute delay (EventTimeWatermark
    //    accumulates eventTimeUs/1000); kept iff window END (µs) >
    //    wm*1000, emitted iff window end <= final wm * 1000.
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("value"), col("ts"),
        unix_micros(col("ts")).as("ets_us"))
    val st = ev.agg(min("ets_us").as("lo"), max("ets_us").as("hi")).head()
    val (tsMin, tsMax) = (st.getLong(0), st.getLong(1))
    val span = math.max(1L, tsMax - tsMin + 1)
    val order = EventStreams.e4lReplayOrder
    val posOf = order.zipWithIndex.toMap // bucket index -> replay position
    val posCol = (0 until 6).foldLeft(lit(-1)) { (acc, i) =>
      val lo = tsMin + span * i / 6
      val hi = tsMin + span * (i + 1) / 6
      when(col("ets_us") >= lo && col("ets_us") < hi, lit(posOf(i))).otherwise(acc)
    }
    val withPos = ev.withColumn("p", posCol)
    val maxMsByPos = withPos.groupBy("p")
      .agg((max("ets_us") / 1000).cast("long").as("max_ms"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    def wmBefore(p: Int): Option[Long] = {
      val prior = maxMsByPos.filter(_._1 < p).values
      if (prior.isEmpty) None else Some(prior.max - 600000L)
    }
    val wmCol = (0 until 6).foldLeft(lit(null).cast("long")) { (acc, p) =>
      wmBefore(p) match {
        case Some(w) => when(col("p") === p, lit(w)).otherwise(acc)
        case None    => acc
      }
    }
    val finalWmMs = maxMsByPos.values.max - 600000L
    val winEndUs = unix_micros(date_trunc("hour", col("ts"))) + lit(3600000000L)
    val expected = withPos.withColumn("wm_ms", wmCol)
      .where(col("wm_ms").isNull || winEndUs > col("wm_ms") * 1000)
      .groupBy(date_trunc("hour", col("ts")).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .where(unix_micros(col("win")) + lit(3600000000L) <= lit(finalWmMs * 1000))
      .select(unix_timestamp(col("win")).as("win_start"),
        col("event_type"), col("n"), col("value_cents"))
    val streamed = spark.table(name)
    assert(streamed.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(streamed).count() == 0)
    assert(streamed.count() > 0)

    // 3. the drop rule changes the answer — this key demonstrates what
    //    the in-order parity keys cannot
    val naive = graft.ops.EventOps.e4TimeWindow(spark, sf)
    assert(streamed.count() < naive.count(),
      "out-of-order replay should emit strictly fewer windows than the naive batch agg")
  }
}
