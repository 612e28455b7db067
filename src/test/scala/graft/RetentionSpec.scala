package graft

import java.time.{DayOfWeek, ZoneOffset}
import java.time.temporal.TemporalAdjusters
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.EventOps

/** e61 — retention cohort matrix. Recomputes the cohort grid from the
  * raw events with java.time week arithmetic (independent of Spark's
  * date_trunc) and requires exact agreement; also asserts the
  * structural invariants a retention matrix must satisfy. */
class RetentionSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def r6(x: Double): Double =
    BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Monday-start week of an event timestamp, as epoch seconds. */
  private def weekStart(ts: java.sql.Timestamp): Long =
    ts.toInstant.atZone(ZoneOffset.UTC).toLocalDate
      .`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
      .atStartOfDay(ZoneOffset.UTC).toEpochSecond

  test("e61 matches the java.time cohort recompute exactly") {
    val ev = Tables.events(spark, sf).select("user_id", "ts").collect()
      .map(r => (r.getLong(0), weekStart(r.getTimestamp(1))))
    val activity = ev.distinct
    val cohort = activity.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
    val cells = activity
      .map { case (u, w) => (cohort(u), ((w - cohort(u)) / 604800L).toInt) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val sizes = cells.collect { case ((c, 0), n) => c -> n }
    val expect = cells.map { case ((c, o), n) =>
      (c, o) -> (n, sizes(c), r6(n.toDouble / sizes(c))) }

    val rows = EventOps.e61RetentionCohorts(spark, sf).collect()
    assert(rows.length == expect.size, "matrix cell count")
    rows.foreach { r =>
      val key = (r.getLong(0), r.getInt(1))
      val (n, sz, ret) = expect.getOrElse(key, fail(s"unexpected cell $key"))
      assert(r.getLong(2) == n, s"$key n_active")
      assert(r.getLong(3) == sz, s"$key cohort_size")
      assert(r.getDouble(4) == ret, s"$key retention")
    }
  }

  test("e61 invariants: offset-0 is full retention, rates bounded, cohorts cover users") {
    val rows = EventOps.e61RetentionCohorts(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0, "retention in (0,1]")
      if (r.getInt(1) == 0)
        assert(r.getDouble(4) == 1.0, "cohort week is active by construction")
      assert(r.getLong(2) <= r.getLong(3), "active <= cohort size")
    }
    val nUsers = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    val cohortTotal = rows.filter(_.getInt(1) == 0).map(_.getLong(3)).sum
    assert(cohortTotal == nUsers, "cohort sizes must partition the user base")
  }

  test("e61b equals e61 exactly: maintained state re-derives the same matrix") {
    val full = EventOps.e61RetentionCohorts(spark, sf).collect().map(_.toSeq).toSeq
    val incr = EventOps.e61bIncrRetention(spark, sf).collect().map(_.toSeq).toSeq
    assert(incr.nonEmpty && incr == full)
  }

  test("e61b plan: scans state + pushed delta only — never the full base") {
    import org.apache.spark.sql.functions.col
    EventOps.e61bEnsure(spark, sf) // settle the state outside the probe
    // probe the LAZY pipeline (the Plans-dump view): the declared key
    // materializes and releases its cache, which collapses the
    // executed plan to a Scan ExistingRDD stub
    val p = try {
      Tables.keepLazyForPlans = true
      EventOps.e61bIncrRetention(spark, sf)
        .queryExecution.executedPlan.toString
    } finally Tables.keepLazyForPlans = false
    // only two parquet SOURCES: the staged state and the delta (the
    // cached activity relation's build subtree prints under both of
    // its consumers, so count distinct locations, not lines); EVERY
    // base-table scan must carry the pushed boundary so parquet prunes
    // history row groups before any I/O
    val scans = p.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.nonEmpty)
    val stateScans = scans.filter(_.contains("events_retention_state"))
    val baseScans = scans.filterNot(_.contains("events_retention_state"))
    assert(stateScans.nonEmpty && baseScans.nonEmpty,
      s"expected state + delta sources, got:\n${scans.mkString("\n")}")
    assert(baseScans.forall(l => l.contains("events.parquet") &&
        l.contains("GreaterThanOrEqual(ts")),
      s"every base scan must be the boundary-pushed delta:\n${baseScans.mkString("\n")}")
    // delta rows at this fixture are a strict minority of the base —
    // the I/O claim the incremental form exists for
    val base = Tables.events(spark, sf).count()
    val delta = Tables.events(spark, sf)
      .where(col("ts") >= org.apache.spark.sql.functions.lit(
        graft.ops.EventOps.e63Boundary).cast("timestamp")).count()
    assert(delta > 0 && delta < base / 2,
      s"fixture must exercise a genuine delta: $delta of $base")
  }
}
