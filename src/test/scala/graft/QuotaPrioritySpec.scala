package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.CurationOps

/** e58 (per-domain quality quota) and e59 (weighted priority sample) —
  * semantic recompute in plain Scala plus the physical-shape pins that
  * make each the scale-correct form: e58 must rank inside the native
  * bounded-heap TopKPerKey operator (never a corpus window sort), e59
  * must plan its global k as TakeOrderedAndProject (never a full
  * sort). */
class QuotaPrioritySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def r(x: Double, s: Int): Double =
    BigDecimal.valueOf(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private val stops = Set("the", "a", "of", "and", "to")

  /** e10's score, recomputed off-engine: 6 dp ratios, 7 dp blend. */
  private def quality(text: String): Option[Double] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val nChars = text.length
    if (toks.isEmpty || nChars == 0) None
    else {
      val nStop = toks.count(stops)
      val nAlpha = text.toLowerCase.count(c => c >= 'a' && c <= 'z')
      Some(r(r(nStop.toDouble / toks.length, 6) * 0.5 +
        r(nAlpha.toDouble / nChars, 6) * 0.5, 7))
    }
  }

  test("e58 keeps exactly the top-8 quality docs per source, ranked") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r0 => (r0.getLong(0), r0.getString(1), r0.getString(2)))
    val expect = docs
      .flatMap { case (id, src, text) => quality(text).map(q => (src, id, q)) }
      .groupBy(_._1).toSeq
      .flatMap { case (src, g) =>
        g.sortBy { case (_, id, q) => (-q, id) }.take(8).zipWithIndex
          .map { case ((_, id, q), i) => (src, id) -> (q, i + 1) }
      }.toMap
    val rows = CurationOps.e58DomainCap(spark, sf).collect()
    assert(rows.length == expect.size, "quota row count")
    rows.foreach { row =>
      val key = (row.getString(0), row.getLong(1))
      val (q, rnk) = expect.getOrElse(key, fail(s"unexpected doc $key"))
      assert(row.getDouble(2) == q, s"$key quality")
      assert(row.getInt(3) == rnk, s"$key rnk")
    }
  }

  test("e58 ranks in the native TopKPerKey operator, not a corpus window") {
    val p = CurationOps.e58DomainCap(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKeyPartial") && p.contains("TopKPerKeyFinal"),
      s"quota must run the bounded-heap operator:\n$p")
  }

  test("e59 draws the exact Efraimidis-Spirakis top-40 by -ln(u)/w") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "n_chars").collect()
      .map(r0 => (r0.getLong(0), r0.getString(1), r0.getLong(2)))
    val expect = docs.map { case (id, src, w) =>
      val u = (java.lang.Long.parseLong(
        md5hex(s"prio:$id").substring(0, 8), 16) + 1L) / 4294967296.0
      (id, src, w, r(-math.log(u) / w, 12))
    }.sortBy { case (id, _, _, k) => (k, id) }.take(40)
    val rows = CurationOps.e59PrioritySample(spark, sf).collect()
    assert(rows.length == 40)
    rows.zip(expect).foreach { case (row, (id, src, w, k)) =>
      assert(row.getInt(0) == expect.indexWhere(_._1 == id) + 1)
      assert(row.getLong(1) == id, s"rank ${row.getInt(0)} doc")
      assert(row.getString(2) == src)
      assert(row.getLong(3) == w)
      assert(math.abs(row.getDouble(4) - k) < 1e-12, s"doc $id skey")
    }
    // weighting is real: the sampled mean weight should exceed the
    // corpus mean (longer docs win the race more often)
    val corpusMean = docs.map(_._3).sum.toDouble / docs.length
    val sampleMean = rows.map(_.getLong(3)).sum.toDouble / rows.length
    assert(sampleMean > corpusMean,
      s"sample mean weight $sampleMean <= corpus mean $corpusMean — " +
        "the race is not weight-proportional")
  }

  test("e59 plans the global k as TakeOrdered, never a full sort") {
    val p = CurationOps.e59PrioritySample(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"global top-k must be a bounded heap:\n$p")
  }
}
