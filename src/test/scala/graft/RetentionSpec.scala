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
}
