package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{CurationOps, SimOps}

/** e70/e70b — the full-width curation composition. The oracle already
  * replays the DAG as chained CTEs; this spec recomputes it a THIRD
  * way — from the declared component keys (e20's contamination set,
  * e10b's pass set, e6's verified pairs) plus plain-Scala union-find,
  * md5 draws, running-sum packing, and window sharding — so a drift
  * in the composition (stage order, survivor threading, window
  * arithmetic) is caught even if engine and oracle drift together.
  *
  * The pair restriction is sound because LSH candidacy and Jaccard
  * are PAIR-LOCAL: signatures are per-doc, so the candidate pairs of
  * the survivor subset are exactly the full-corpus pairs with both
  * endpoints surviving.
  *
  * Since r13 the packing window is keyed by (source, pack_shard) —
  * pack_shard = e26's md5 hash of doc_id — so per-task sort volume is
  * bounded at any source skew (r12 verdict ask #6); the recompute
  * mirrors that keying, and the e70b test pins the leakage-safe
  * split: split-then-pack on the cluster rep, so a window can never
  * straddle splits and a near-dup pair can never straddle them
  * either. */
class E70CurationSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private def md5hex8(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(8), 16)

  private def splitOf(rep: Long): String = {
    val b = java.lang.Long.parseLong(md5hex(rep.toString).take(15), 16) % 10
    if (b < 8) "train" else if (b == 8) "val" else "test"
  }

  /** Stages 1-4 recomputed from the declared component keys: returns
    * the accepted survivors (doc_id, source, n_tok) and the union-find
    * root function over the survivor candidate edges. */
  private def acceptedSurvivors()
      : (Seq[(Long, String, Long)], Long => Long) = {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)).getOrElse("")))
    def benchMember(id: Long) = id % 23 == 7 && id < 100000L
    val contaminated = CurationOps.e20Decontaminate(spark, sf)
      .where(col("is_contaminated")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val passes = CurationOps.e10bGopherRepetition(spark, sf)
      .where(col("passes_repetition")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val s12 = docs.filter { case (id, _, _) =>
      !benchMember(id) && !contaminated(id) && passes(id) }
    val s12Ids = s12.map(_._1).toSet
    assert(s12.nonEmpty && s12.length < docs.length,
      "stages 1-2 must drop something and keep something")
    // dedup: full-corpus verified pairs restricted to survivors
    // (pair-local LSH, see scaladoc), then union-find, min-id keeper
    val edges = SimOps.e6MinhashLsh(spark, sf)
      .where(col("jaccard") >= 0.5).select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => s12Ids(a) && s12Ids(b) }
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val dropped = (edges.flatMap(e => Seq(e._1, e._2)).distinct)
      .filter(n => find(n) != n).toSet
    // mixture accept: e24's md5 draw, src0..src4 at 0.75, else 0.25
    val dim = Set("src0", "src1", "src2", "src3", "src4")
    def accept(id: Long, source: String): Boolean = {
      val u = md5hex8(s"mix:$id").toDouble / 4294967296.0
      u < (if (dim(source)) 0.75 else 0.25)
    }
    def nTok(text: String): Long =
      text.toLowerCase.split("\\s+").count(_.nonEmpty).toLong
    val accepted = s12
      .filter { case (id, _, _) => !dropped(id) }
      .filter { case (id, src, _) => accept(id, src) }
      .map { case (id, src, text) => (id, src, nTok(text)) }.toSeq
    (accepted, find)
  }

  /** Running-offset packing within each key group (doc_id order,
    * 256-token windows) → per-window (docs, tokens) keyed by the
    * group + window id. */
  private def pack(groups: Map[Seq[String], Seq[(Long, Long)]])
      : Map[(Seq[String], Long), (Long, Long)] = {
    val byWindow = scala.collection.mutable.Map[(Seq[String], Long), (Long, Long)]()
    groups.foreach { case (key, ds) =>
      var cum = 0L
      ds.sortBy(_._1).foreach { case (_, t) =>
        val w = (cum / 256.0).toLong // cum = sum before this doc
        cum += t
        val (nd, nt) = byWindow.getOrElse((key, w), (0L, 0L))
        byWindow((key, w)) = (nd + 1, nt + t)
      }
    }
    byWindow.toMap
  }

  test("e70 equals an independent recompute from the declared stage keys") {
    val (accepted, _) = acceptedSurvivors()
    // packing: per-(source, pack_shard) running offset in doc_id
    // order; shard the windows by md5(source:pack_shard:window) % 64
    val groups = accepted
      .groupBy { case (id, src, _) => Seq(src, (md5hex8(id.toString) % 64).toString) }
      .map { case (k, ds) => k -> ds.map(d => (d._1, d._3)) }
    val stats = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
    pack(groups).foreach { case ((Seq(src, psh), w), (nd, nt)) =>
      val shard = md5hex8(s"$src:$psh:$w") % 64
      val (nw, d0, t0) = stats.getOrElse(shard, (0L, 0L, 0L))
      stats(shard) = (nw + 1, d0 + nd, t0 + nt)
    }
    val expected = stats.toSeq
      .map { case (sh, (nw, nd, nt)) => (sh, nw, nd, nt) }.sortBy(_._1)
    val got = CurationOps.e70CurationPipeline(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.nonEmpty)
    assert(got == expected,
      s"composition drift: got ${got.take(5)}... expected ${expected.take(5)}...")
  }

  test("e70b equals the recompute; split is cluster-keyed and leak-free by construction") {
    val (accepted, find) = acceptedSurvivors()
    // split on the CC rep (keepers are their own rep — the dropped
    // near-dups never reach the output, so reps partition cleanly)
    def rep(id: Long): Long = find(id)
    val withSplit = accepted.map { case (id, src, t) => (id, src, t, splitOf(rep(id))) }
    assert(withSplit.groupBy(r => rep(r._1))
      .forall { case (_, rs) => rs.map(_._4).distinct.size == 1 },
      "one rep → one split: leakage-free by construction")
    val groups = withSplit
      .groupBy { case (id, src, _, sp) =>
        Seq(sp, src, (md5hex8(id.toString) % 64).toString) }
      .map { case (k, ds) => k -> ds.map(d => (d._1, d._3)) }
    val stats = scala.collection.mutable.Map[(String, Long), (Long, Long, Long)]()
    pack(groups).foreach { case ((Seq(sp, src, psh), w), (nd, nt)) =>
      val shard = md5hex8(s"$sp:$src:$psh:$w") % 64
      val (nw, d0, t0) = stats.getOrElse((sp, shard), (0L, 0L, 0L))
      stats((sp, shard)) = (nw + 1, d0 + nd, t0 + nt)
    }
    val expected = stats.toSeq
      .map { case ((sp, sh), (nw, nd, nt)) => (sp, sh, nw, nd, nt) }
      .sortBy(t => (t._1, t._2))
    val got = CurationOps.e70bCurationSplit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.nonEmpty)
    assert(got.forall(_._6 == 0L), "leak_clusters must be 0 by construction")
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5)).toSeq == expected,
      s"split-pack drift: got ${got.take(5)}... expected ${expected.take(5)}...")
    // the split totals cover every accepted doc exactly once
    assert(got.map(_._4).sum == accepted.size.toLong)
  }
}
