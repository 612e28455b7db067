package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SimOps

/** e60 — edit-distance confirmation of blocked near-dup candidates.
  * The spec recomputes the whole stage off-engine (prefix blocking,
  * block cap, length prune, Levenshtein DP on the truncated text) and
  * requires an exact match; it also proves the length prune is SOUND
  * for the 0.6 bar — no pair it drops could have been confirmed — and
  * that the verdict column is exactly the thresholded score. */
class EditConfirmSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def r6(x: Double): Double =
    BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def lev(a: String, b: String): Int = {
    val prev = Array.tabulate(b.length + 1)(identity)
    val cur = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1),
          prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      Array.copy(cur, 0, prev, 0, cur.length)
    }
    prev(b.length)
  }

  /** (blocked docs after cap) and (all capped-block pairs, UNPRUNED) —
    * the prune and the score are applied by the caller so soundness
    * can be checked against the pre-prune pair set. */
  private def candidates(): Seq[(Long, Long, Int, Int, Int)] = {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map { r => (r.getLong(0), r.getString(1)) }
    val prepped = docs.flatMap { case (id, text) =>
      val norm = text.toLowerCase.replaceAll("\\s+", " ").trim
      val t = norm.substring(0, math.min(400, norm.length))
      if (t.isEmpty) None
      else {
        val pfx = text.toLowerCase.split("\\s+").filter(_.nonEmpty).take(3)
        Some((md5hex(pfx.mkString(" ")), id, t))
      }
    }
    prepped.groupBy(_._1).values
      .filter(g => g.length >= 2 && g.length <= 32)
      .flatMap { g =>
        val s = g.sortBy(_._2)
        for {
          i <- s.indices; j <- (i + 1) until s.length
        } yield (s(i)._2, s(j)._2, s(i)._3.length, s(j)._3.length,
          lev(s(i)._3, s(j)._3))
      }.toSeq
  }

  test("e60 matches the off-engine recompute: blocking, cap, prune, DP distance") {
    val all = candidates()
    val expect = all
      .filter { case (_, _, la, lb, _) =>
        math.abs(la - lb) * 5 <= math.max(la, lb) * 2 }
      .map { case (a, b, la, lb, d) =>
        (a, b) -> (la, lb, d, r6(1.0 - d.toDouble / math.max(la, lb))) }
      .toMap
    val rows = SimOps.e60EditConfirm(spark, sf).collect()
    assert(rows.length == expect.size,
      s"pair count ${rows.length} != ${expect.size}")
    assert(rows.nonEmpty, "fixture produced no candidate pairs — " +
      "the blocking key is degenerate at this scale")
    rows.foreach { row =>
      val key = (row.getLong(0), row.getLong(1))
      val (la, lb, d, sim) = expect.getOrElse(key, fail(s"unexpected pair $key"))
      assert(row.getInt(2) == la && row.getInt(3) == lb, s"$key lengths")
      assert(row.getInt(4) == d, s"$key lev")
      assert(row.getDouble(5) == sim, s"$key sim")
      assert(row.getLong(6) == (if (sim >= 0.6) 1L else 0L), s"$key verdict")
    }
  }

  test("e60 length prune is sound: no dropped pair could reach the 0.6 bar") {
    candidates()
      .filter { case (_, _, la, lb, _) =>
        math.abs(la - lb) * 5 > math.max(la, lb) * 2 }
      .foreach { case (a, b, la, lb, d) =>
        val sim = 1.0 - d.toDouble / math.max(la, lb)
        assert(sim < 0.6,
          s"pruned pair ($a,$b) scores $sim >= 0.6 — the prune is unsound")
      }
  }
}
