package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ClusterOps

import java.nio.file.Files

/** Fault-tolerance properties the reference embodies and a cluster needs:
  *
  *  - e16's iterative state goes through RELIABLE `checkpoint()` files
  *    (not executor-local blocks), so executor loss mid-loop is
  *    recoverable;
  *  - a stopped streaming query restarted from its checkpoint resumes
  *    with exactly-once semantics — already-ingested files are not
  *    re-counted, newly-arrived files are (the reference's resumable
  *    page-at-a-time scrape with a seen-set, web_scrpaer_2.py:246-281).
  */
class RecoverySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("e16 iterative state lands in the reliable checkpoint dir") {
    val ckptDir = Files.createTempDirectory("graft-ckpt-e16")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    val out = ClusterOps.e16DedupClusters(spark, sf)
    assert(out.count() > 0)
    // reliable checkpoint = actual files under the configured dir
    val files = Files.walk(ckptDir).filter(Files.isRegularFile(_)).count()
    assert(files > 0, s"no checkpoint files under $ckptDir")
  }

  test("foreachBatch parquet sink is idempotent across re-runs of the same checkpoint") {
    val out = Files.createTempDirectory("graft-fb").toString
    val n1 = graft.streaming.EventStreams.streamEventsToParquet(spark, sf, out)
    assert(n1 > 0)
    val afterFirst = spark.read.parquet(s"$out/batch=*").count()
    assert(afterFirst == Tables.events(spark, sf).count())
    // second run, same checkpoint, no new source files: nothing replays,
    // nothing duplicates
    val n2 = graft.streaming.EventStreams.streamEventsToParquet(spark, sf, out)
    assert(n2 == 0, s"drained source should yield no batches, got $n2")
    assert(spark.read.parquet(s"$out/batch=*").count() == afterFirst)
  }

  test("e1s seen-set state survives stop/restart: no key re-emitted, none lost") {
    val base = Files.createTempDirectory("graft-dedup-recov")
    val landing = base.resolve("landing")
    val staged = base.resolve("staged")
    val ckpt = base.resolve("ckpt").toString
    Files.createDirectories(landing)

    // phase A carries only even users; phase B carries EVERY event — so
    // the restart sees all phase-A keys again (they must not re-emit)
    // plus the odd-user keys (they must)
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "event_type")
    ev.where(col("user_id") % 2 === 0)
      .coalesce(1).write.parquet(s"$staged/a")
    ev.coalesce(1).write.parquet(s"$staged/b")
    def stagedFile(sub: String): java.nio.file.Path =
      Files.list(staged.resolve(sub))
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()

    // memory sink cannot recover an append-mode checkpoint — the
    // restartable sink is foreachBatch (same pattern as
    // streamEventsToParquet), one batch=<id> dir per micro-batch
    val sink = base.resolve("sink").toString
    def runOnce(): Unit = {
      val q = spark.readStream
        .schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing.toString)
        .dropDuplicates("user_id", "event_type")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          df.write.mode("overwrite").parquet(s"$sink/batch=$id")
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // phase A: only the even-user file has arrived; dedup, then STOP
    Files.copy(stagedFile("a"), landing.resolve("part-a.parquet"))
    runOnce()
    val batchesA = Files.list(java.nio.file.Paths.get(sink)).toArray
      .map(_.toString).filter(_.contains("batch=")).sorted
    val keysA = spark.read.parquet(batchesA: _*)
      .select("user_id", "event_type")

    // phase B: the FULL event file arrives (phase-A keys included);
    // restart from the SAME checkpoint — the new batch dirs receive
    // exactly the keys first seen AFTER restart
    Files.copy(stagedFile("b"), landing.resolve("part-b.parquet"))
    runOnce()
    val batchesB = Files.list(java.nio.file.Paths.get(sink)).toArray
      .map(_.toString).filter(_.contains("batch=")).sorted
      .filterNot(batchesA.contains)
    assert(batchesB.nonEmpty, "restart produced no new micro-batches")
    val keysB = spark.read.parquet(batchesB: _*)
      .select("user_id", "event_type")

    val nA = keysA.count(); val nB = keysB.count()
    val allKeys = ev.select("user_id", "event_type").distinct().count()
    assert(nA > 0 && nB > 0, s"both phases must emit: $nA / $nB")
    // state survived: a key seen in phase A is never re-emitted in phase B
    assert(keysA.join(keysB, Seq("user_id", "event_type")).count() == 0,
      "restart re-emitted already-seen keys — seen-set state was lost")
    // and nothing is lost: the two phases partition the distinct key set
    assert(nA + nB == allKeys, s"$nA + $nB != $allKeys")
  }

  test("streaming restart from checkpoint: exactly-once across stop/resume") {
    val base = Files.createTempDirectory("graft-recov")
    val landing = base.resolve("landing")
    val staged = base.resolve("staged")
    val ckpt = base.resolve("ckpt").toString
    Files.createDirectories(landing)

    // stage the events table as 4 parquet part-files
    val ev = Tables.events(spark, sf).select("event_id", "event_type")
    ev.repartition(4).write.parquet(staged.toString)
    val parts = Files.list(staged).filter(_.getFileName.toString.endsWith(".parquet"))
      .sorted().toArray.map(_.asInstanceOf[java.nio.file.Path])
    assert(parts.length == 4)

    def runOnce(sinkName: String): Unit = {
      val q = spark.readStream
        .schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing.toString)
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .writeStream
        .format("memory").queryName(sinkName).outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // phase A: only half the files have arrived; stream drains and STOPS
    parts.take(2).foreach(p => Files.copy(p, landing.resolve(p.getFileName)))
    runOnce("recov_a")
    val partial = spark.table("recov_a").agg(sum("n")).collect()(0).getLong(0)

    // phase B: the rest arrives; restart from the SAME checkpoint
    parts.drop(2).foreach(p => Files.copy(p, landing.resolve(p.getFileName)))
    runOnce("recov_b")

    val total = ev.count()
    assert(partial > 0 && partial < total,
      s"phase A should be a strict subset: $partial vs $total")
    // exactly-once: phase-A files are counted exactly once after restart —
    // re-ingesting them would inflate counts, dropping state would shrink them
    val streamed = spark.table("recov_b").orderBy("event_type")
    val batch = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy("event_type")
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }
}
