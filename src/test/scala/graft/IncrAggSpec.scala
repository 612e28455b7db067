package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.EventOps

/** e63 — incremental aggregate maintenance. The claim under test is NOT
  * "the rollup is right" alone (the DuckDB oracle's full recompute
  * covers that) but that the incremental path really is incremental:
  * the refreshed plan must read the staged state instead of the base
  * rows, and the only events scan it performs must carry the pushed
  * delta boundary.
  */
class IncrAggSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def r6(x: Double): Double =
    BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("merged state+delta equals the full recompute (plain-Scala fold)") {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string").as("d"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val partials = rows.groupBy(r => (r._1, r._2)).map { case (k, v) =>
      k -> (v.size.toLong, v.map(_._3).sum, v.map(_._3).min, v.map(_._3).max)
    }
    val expect = partials.groupBy(_._1._1).map { case (t, m) =>
      val ps = m.values
      t -> (ps.map(_._1).sum, ps.map(_._2).sum, ps.map(_._3).min,
        ps.map(_._4).max, m.size.toLong)
    }
    val got = EventOps.e63IncrAgg(spark, sf).collect()
    assert(got.length == expect.size, "event_type count")
    got.foreach { r =>
      val (n, sum, mn, mx, days) = expect(r.getString(0))
      assert(r.getLong(1) == n, s"${r.getString(0)} n")
      assert(r.getLong(2) == sum, s"${r.getString(0)} sum_cents")
      assert(r.getLong(3) == mn && r.getLong(4) == mx, s"${r.getString(0)} min/max")
      assert(r.getLong(5) == days, s"${r.getString(0)} day partials")
      assert(r.getDouble(6) == r6(sum.toDouble / n), s"${r.getString(0)} avg")
    }
  }

  test("the refresh reads staged state + a boundary-filtered delta scan only") {
    EventOps.e63Ensure(spark, sf)
    val plan = EventOps.e63IncrAgg(spark, sf)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("events_agg_state"),
      "plan must scan the staged partial-aggregate state")
    // exactly one scan of the raw events table, and it must carry the
    // pushed >= boundary predicate (a row-group-prunable comparison)
    val eventScans = plan.linesIterator
      .filter(l => l.contains("events.parquet")).toSeq
    assert(eventScans.nonEmpty, "delta side must scan events")
    assert(plan.contains("GreaterThanOrEqual(ts"),
      s"delta boundary must be pushed to the scan:\n$plan")
  }

  test("state is partial-aggregate shaped: one row per (type, day), re-aggregable") {
    EventOps.e63Ensure(spark, sf)
    val state = spark.read.parquet(EventOps.e63StateDir(sf))
    val keyed = state.groupBy("event_type", "d").count()
      .where(col("count") > 1).count()
    assert(keyed == 0, "state grain must be unique (type, day)")
    // state covers strictly pre-boundary days
    val late = state.where(
      col("d") >= lit(EventOps.e63Boundary).cast("date")).count()
    assert(late == 0, "no post-boundary day may be folded into state")
  }
}
