package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.EventOps

/** e68 — incremental percentile maintenance. The merged-histogram
  * quantiles are replayed in plain Scala (sort + order statistics, no
  * binning shortcuts shared with the engine), the state plumbing is
  * held to the e63 discipline, and the declared resolution contract is
  * asserted: each reported p-cents is exactly the bin of the true
  * ⌈p·n⌉-th order statistic.
  */
class HistQuantileSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def binOf(cents: Long): Long = math.min(cents / 1000, 39L)

  test("merged quantiles equal order statistics binned — the resolution contract") {
    val byType = Tables.events(spark, sf)
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, v) => t -> v.map(_._2).sorted }
    val rows = EventOps.e68HistQuantiles(spark, sf).collect()
    assert(rows.length == byType.size, "type count")
    rows.foreach { r =>
      val cents = byType(r.getString(0))
      val n = cents.length.toLong
      assert(r.getLong(1) == n, s"${r.getString(0)} total")
      // k-th smallest (1-based) with k = ceil(p*n), then its bin edge
      def stat(num: Long, den: Long): Long = {
        val k = (num * n + den - 1) / den
        binOf(cents((k - 1).toInt)) * 1000
      }
      assert(r.getLong(2) == stat(1, 2), s"${r.getString(0)} p50")
      assert(r.getLong(3) == stat(9, 10), s"${r.getString(0)} p90")
      assert(r.getLong(4) == stat(99, 100), s"${r.getString(0)} p99")
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(3) <= r.getLong(4),
        "quantiles monotone")
    }
  }

  test("the refresh reads histogram state + a boundary-filtered delta only") {
    EventOps.e68Ensure(spark, sf)
    val plan = EventOps.e68HistQuantiles(spark, sf)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("events_hist_state"), "plan must scan staged bins")
    assert(plan.contains("GreaterThanOrEqual(ts"),
      "delta boundary must be pushed to the scan")
    val state = spark.read.parquet(EventOps.e68StateDir(sf))
    assert(state.groupBy("event_type", "d", "bin").count()
      .where(col("count") > 1).count() == 0, "state grain unique")
    assert(state.where(
      col("d") >= lit(EventOps.e63Boundary).cast("date")).count() == 0,
      "no post-boundary day in state")
  }
}
