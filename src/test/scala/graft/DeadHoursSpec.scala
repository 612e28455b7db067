package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.EventOps

/** e53b — dead-source detection over the DENSIFIED hourly series: the
  * calendar-frame variant the e53 docstring names as out of reach for
  * the observed-rows form. The spec recomputes the zero-filled series,
  * the trailing-24-row stats, and the dead/anomaly verdicts from the
  * raw events in plain Scala and requires the engine summary to match
  * exactly; it also proves the in-plan synthetic outages actually
  * EXERCISE the dead path (silent hours exist, dead hours exist) —
  * the observable e53 structurally cannot produce. */
class DeadHoursSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def r6(x: Double): Double =
    BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private case class Summary(
      nHours: Long, nSilent: Long, nDead: Long, nAnom: Long,
      maxZ: Option[Double], minZ: Option[Double])

  /** The reference recompute: hourly counts with outage hours blanked,
    * densified over the UNFILTERED global hour span, 24-row trailing
    * window, z at 6 dp, dead = silent hour under an active baseline. */
  private def reference(): Map[String, Summary] = {
    val raw = Tables.events(spark, sf)
      .select("event_type", "ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1)))
    def hourFloor(t: Timestamp): Long = t.getTime / 1000L / 3600L
    val allHours = raw.map(t => hourFloor(t._2))
    val (mn, mx) = (allHours.min, allHours.max)
    val types = raw.map(_._1).distinct.sorted
    val blanked = raw.filter { case (_, t) =>
      val m = hourFloor(t) % 97L; m != 13L && m != 50L }
    val counts = blanked.groupBy(e => (e._1, hourFloor(e._2)))
      .map { case (k, v) => k -> v.length.toLong }
    types.map { et =>
      val series = (mn to mx).map(h => counts.getOrElse((et, h), 0L))
      var silent, dead, anom = 0L
      val zs = scala.collection.mutable.ArrayBuffer.empty[Double]
      series.indices.foreach { i =>
        val n = series(i)
        val w = series.slice(math.max(0, i - 24), i)
        val mu = if (w.nonEmpty) w.sum.toDouble / w.size else Double.NaN
        val sd =
          if (w.size >= 2) {
            val m = w.sum.toDouble / w.size
            math.sqrt(w.map(x => (x - m) * (x - m)).sum / (w.size - 1))
          } else Double.NaN
        val z = if (!sd.isNaN && sd > 0) Some(r6((n - mu) / sd)) else None
        if (n == 0) silent += 1
        if (n == 0 && !mu.isNaN && mu > 0) dead += 1
        z.foreach { zv => zs += zv; if (math.abs(zv) >= 3.0) anom += 1 }
      }
      et -> Summary(series.size.toLong, silent, dead, anom,
        if (zs.nonEmpty) Some(zs.max) else None,
        if (zs.nonEmpty) Some(zs.min) else None)
    }.toMap
  }

  test("e53b summary matches the plain-Scala densified recompute exactly") {
    val ref = reference()
    val rows = EventOps.e53bDeadHours(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == ref.keySet)
    rows.foreach { r =>
      val et = r.getString(0)
      val e = ref(et)
      assert(r.getLong(1) == e.nHours, s"$et n_hours")
      assert(r.getLong(2) == e.nSilent, s"$et n_silent")
      assert(r.getLong(3) == e.nDead, s"$et n_dead")
      assert(r.getLong(4) == e.nAnom, s"$et n_anomalies")
      assert(Option(r.get(5)).map(_.asInstanceOf[Double]) == e.maxZ, s"$et max_z")
      assert(Option(r.get(6)).map(_.asInstanceOf[Double]) == e.minZ, s"$et min_z")
    }
  }

  test("e53b dead path is exercised: outages produce silent AND dead hours") {
    val rows = EventOps.e53bDeadHours(spark, sf).collect()
    val silent = rows.map(_.getLong(2)).sum
    val dead = rows.map(_.getLong(3)).sum
    assert(silent > 0, "synthetic outages produced no silent hours — " +
      "the densification is not being exercised")
    assert(dead > 0, "no dead hours flagged — baseline never active " +
      "across an outage, the verdict path is untested")
    assert(dead <= silent, "dead is a subset of silent by definition")
    // the frame is calendar-complete: every type scores every spine hour
    val spanHours = rows.map(_.getLong(1)).distinct
    assert(spanHours.length == 1 && spanHours.head >= 24,
      s"types disagree on the spine or the span is degenerate: $spanHours")
  }
}
