package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.EventOps
import graft.streaming.EventStreams

/** Streaming-vs-batch parity — the reference's own correctness device
  * (sequential EP3 vs parallel EP2, web_scraper.py:311-354) applied to
  * the Structured Streaming forms: the watermarked streaming aggregation
  * must produce exactly the batch answer once the source is drained. */
class StreamingParitySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .option("checkpointLocation", s"/tmp/graft-ckpt-$name-${System.nanoTime()}")
      .start()
    q.processAllAvailable()
    q.stop()
  }

  test("E4 streaming tumbling window equals the batch result") {
    runToMemory(EventStreams.e4TimeWindowStream(spark, sf), "e4s")
    val streamed = spark.table("e4s").orderBy("win_start", "event_type")
    val batch = EventOps.e4TimeWindow(spark, sf)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    assert(batch.count() > 0)
  }

  test("E5 streaming session window equals the batch result") {
    runToMemory(EventStreams.e5SessionWindowStream(spark, sf), "e5s")
    val streamed = spark.table("e5s").orderBy("user_id", "sess_start")
    val batch = EventOps.e5SessionWindow(spark, sf)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    assert(batch.count() > 0)
  }

  test("E4 parity holds across a REAL multi-batch incremental replay") {
    // the single-file staging above drains in one micro-batch, which
    // cannot distinguish incremental state maintenance from a batch
    // recompute. The bucketed staging replays the timeline as 6
    // time-ordered micro-batches, so the tumbling-window aggregation
    // must carry window state ACROSS batches (and the advancing
    // watermark must drop nothing: buckets are disjoint contiguous time
    // ranges, so no row is ever behind the previous batch's maximum)
    val streamed6 = EventStreams.eventsStreamBucketed(spark, sf, 6)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("value_cents"))
    val name = "e4s_multibatch"
    val q = streamed6.writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .option("checkpointLocation", s"/tmp/graft-ckpt-$name-${System.nanoTime()}")
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 6,
      "expected one micro-batch per staged bucket")
    val streamed = spark.table(name)
    val batch = EventOps.e4TimeWindow(spark, sf)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    assert(batch.count() > 0)
  }

  test("E29 stream-stream interval join equals the batch join") {
    val name = "e29s_parity"
    val q = EventStreams.e29StreamJoin(spark, sf).writeStream
      .format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation", s"/tmp/graft-ckpt-$name-${System.nanoTime()}")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(name)
    val ev = graft.Tables.events(spark, sf)
    val batch = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .join(ev.where(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"),
            col("user_id").as("p_user"), col("ts").as("purchase_ts")),
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 6 HOURS"))
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        unix_micros(col("click_ts")).as("click_ts_us"),
        unix_micros(col("purchase_ts")).as("purchase_ts_us"))
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    assert(batch.count() > 0, "fixture must produce at least one join pair")
  }

  test("C4 incremental dedup: streaming dropDuplicates equals batch distinct") {
    // the reference's seen-set (web_scrpaer_2.py:262-263) as checkpointed
    // streaming state: watermarked dropDuplicates over the event stream
    val dedup = EventStreams.eventsStream(spark, sf)
      .withWatermark("ts", "1 hour")
      .dropDuplicates("user_id")
      .select(col("user_id"))
    val q = dedup.writeStream
      .format("memory").queryName("c4dd").outputMode("append")
      .option("checkpointLocation", s"/tmp/graft-ckpt-c4dd-${System.nanoTime()}")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("c4dd").count()
    val batch = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(streamed == batch)
  }

  test("C4 custom state: flatMapGroupsWithState running totals converge to batch") {
    val out = graft.streaming.StatefulOps.c4StatefulTotals(spark, sf)
    val batch = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(coalesce(round(col("value") * 100).cast("long"), lit(0L)))
          .as("value_cents"))
      .orderBy("user_id")
    assert(out.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(out).count() == 0)
    assert(out.count() > 0)
  }

  test("E51 streaming transitions with one-row-per-user state equal the batch window") {
    val streamed = graft.streaming.StatefulOps.e51sTransitionsStream(spark, sf)
    val batch = EventOps.e51EventTransitions(spark, sf)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    assert(batch.count() > 0)
    // the 6-bucket / 3-files-per-trigger replay guarantees at least one
    // batch BOUNDARY inside the timeline, so the parity above proves the
    // carried last-event state produces the cross-boundary transitions —
    // a single-batch drain could not distinguish state carry from resort
    val total = streamed.agg(sum("n")).head().getLong(0)
    val events = graft.Tables.events(spark, sf)
    val nUsers = events.select("user_id").distinct().count()
    assert(total == events.count() - nUsers,
      "every user contributes exactly (n_events - 1) transitions")
  }

  test("C5 dead-letter decode never throws: malformed props become error rows") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"k": 5}"""), (2L, "not json at all"), (3L, null.asInstanceOf[String]))
      .toDF("id", "props")
    val out = EventStreams.deadLetter(df).collect()
    assert(out.length == 3)
    val byId = out.map(r => r.getLong(0) -> r.getAs[Boolean]("is_dead")).toMap
    assert(byId == Map(1L -> false, 2L -> true, 3L -> false))
    val reason = out.find(_.getLong(0) == 2L).get.getAs[String]("dead_reason")
    assert(reason != null && reason.startsWith("unparseable: "))
  }
}
