package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ClusterOps

/** e64 — PageRank power iteration. An independent plain-Scala
  * implementation (maps and folds, no Spark) replays the same six
  * rounds under the same 12-dp rounding discipline and must agree
  * EXACTLY — plus the invariants a rank vector owes: positivity, mass
  * conservation to rounding, and the jump floor for sink nodes.
  */
class PagerankSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def r12(x: Double): Double =
    BigDecimal.valueOf(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The reference iteration: same derivation, same rounding points. */
  private def reference(): (Map[Long, Double], Map[Long, Long], Int) = {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("node"))
      .where(col("node").isNotNull)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getLong(3)))
    val edges = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val seq = es.sortBy(e => (e._2.getTime, e._2.getNanos, e._3)).map(_._4)
      seq.zip(seq.drop(1))
    }.groupBy(identity).map { case ((a, b), v) => (a, b) -> v.size.toLong }
    val nodes = ev.map(_._4).distinct.sorted
    val n = nodes.length
    val outw = edges.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val probs = edges.map { case ((a, b), w) => (a, b, w.toDouble / outw(a)) }
    val srcs = outw.keySet
    var ranks: Map[Long, Double] = nodes.map(_ -> r12(1.0 / n)).toMap
    val jump = r12(0.15 / n)
    for (_ <- 1 to 6) {
      val dang = r12(nodes.filterNot(srcs).map(ranks).sum)
      val in = probs.groupBy(_._2).map { case (dst, es) =>
        dst -> r12(es.map(e => e._3 * ranks(e._1)).sum)
      }
      ranks = nodes.map(nd =>
        nd -> r12(jump + 0.85 * (in.getOrElse(nd, 0.0) + dang / n))).toMap
    }
    val inDeg = probs.groupBy(_._2).map { case (d, es) => d -> es.size.toLong }
    (ranks, inDeg.withDefaultValue(0L), n)
  }

  test("six rounds match the plain-Scala power iteration exactly") {
    val (expRanks, expInDeg, _) = reference()
    val got = ClusterOps.e64Pagerank(spark, sf).collect()
    assert(got.length == expRanks.size, "node count")
    got.foreach { r =>
      val node = r.getLong(0)
      assert(r.getDouble(1) == expRanks(node), s"rank of $node")
      assert(r.getLong(2) == expInDeg(node), s"in_deg of $node")
    }
  }

  test("rank vector invariants: positive, mass-conserving, jump-floored") {
    val rows = ClusterOps.e64Pagerank(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.length
    val floor = r12(0.15 / n)
    rows.foreach { r =>
      assert(r.getDouble(1) >= floor - 1e-9,
        s"node ${r.getLong(0)} below the jump floor")
    }
    val mass = rows.map(_.getDouble(1)).sum
    // 6 rounds x (#nodes + 2) roundings at 5e-13 each
    assert(math.abs(mass - 1.0) < 1e-8, s"total mass $mass")
  }
}
