package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.EventOps

/** e66 — incremental distinct maintenance. The load-bearing claim is
  * EXACT, not approximate: a union of per-(type, day) HLL sketches must
  * estimate IDENTICALLY to one sketch built over all history (register
  * max is associative), so the incremental refresh loses nothing vs the
  * batch rebuild it replaces. The gate itself is then checked against
  * an exact distinct recompute.
  */
class HllStateMergeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("state ∪ delta estimates exactly equal the direct all-history sketch") {
    val direct = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id")))
        .cast("long").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = EventOps.e66Merged(spark, sf).collect()
    assert(merged.length == direct.size, "type count")
    merged.foreach { r =>
      assert(r.getLong(2) == direct(r.getString(0)),
        s"${r.getString(0)}: incremental estimate must be bit-equal to batch")
    }
  }

  test("the declared gate holds and matches an exact recompute") {
    val exact = Tables.events(spark, sf)
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, v) => t -> v.map(_._2).distinct.length.toLong }
    val days = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts"))).collect()
      .map(r => (r.getString(0), r.getDate(1).toString))
      .distinct.groupBy(_._1).map { case (t, v) => t -> v.size.toLong }
    val rows = EventOps.e66HllStateMerge(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == days(r.getString(0)), s"${r.getString(0)} day grain")
      assert(r.getLong(2) == exact(r.getString(0)), s"${r.getString(0)} exact")
      assert(r.getBoolean(3), s"${r.getString(0)} sketch outside the bound")
    }
  }

  test("sketch state is pre-boundary (type, day) grained, like e63's") {
    EventOps.e66Ensure(spark, sf)
    val state = spark.read.parquet(EventOps.e66StateDir(sf))
    assert(state.groupBy("event_type", "d").count()
      .where(col("count") > 1).count() == 0, "state grain unique")
    assert(state.where(
      col("d") >= lit(EventOps.e63Boundary).cast("date")).count() == 0,
      "no post-boundary day in state")
  }
}
