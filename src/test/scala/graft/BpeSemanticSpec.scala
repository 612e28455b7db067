package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** e48 (BPE merge training) + e49 (semantic decontamination).
  *
  * The load-bearing claim behind e48 is that a LITERAL string replace
  * over the '||'-bounded token encoding has exactly the sequential
  * greedy left-to-right non-overlapping semantics of the BPE rewrite —
  * so this spec recomputes both iterations in plain Scala with an
  * explicit sequential merge loop and demands bit-equality, proving
  * the encoding claim on real data rather than by argument. e49 gets
  * the same treatment: a brute-force Scala max-cosine pass reproduces
  * the flagged counts.
  */
class BpeSemanticSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def round6(x: Double): Double =
    BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // --- sequential-greedy BPE reference (the semantics e48 must match) ---

  private def fixtureTokens(): Seq[Seq[String]] = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
    docs.toSeq
      .map(_.toLowerCase.split("\\s+").toSeq
        .filter(_.nonEmpty).filter(_.matches("^[a-z0-9]+$")))
      .filter(_.nonEmpty)
  }

  private def bestPair(corpus: Seq[Seq[String]]): ((String, String), Long) = {
    val counts = scala.collection.mutable.Map[(String, String), Long]()
    corpus.foreach(_.sliding(2).foreach {
      case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
      case _         =>
    })
    counts.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.head
  }

  private def greedyMerge(ts: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < ts.length) {
      if (i + 1 < ts.length && ts(i) == a && ts(i + 1) == b) {
        out += (a + "_" + b); i += 2
      } else { out += ts(i); i += 1 }
    }
    out.toSeq
  }

  test("e48: both iterations match a sequential greedy BPE reference exactly") {
    val rows = CurationOps.e48BpeMerge(spark, sf).collect()
    assert(rows.length == 2)
    var corpus = fixtureTokens()
    for (it <- 1 to 2) {
      val r = rows(it - 1)
      val ((a, b), n) = bestPair(corpus)
      val before = corpus.map(_.length.toLong).sum
      val merged = corpus.map(greedyMerge(_, a, b))
      val after = merged.map(_.length.toLong).sum
      assert(r.getInt(0) == it)
      assert((r.getString(1), r.getString(2)) == ((a, b)),
        s"iter $it adopted pair")
      assert(r.getLong(3) == n, s"iter $it n_occ")
      assert(r.getLong(4) == before - after,
        s"iter $it greedy merge count — the replace-encoding claim")
      assert(r.getLong(5) == before && r.getLong(6) == after)
      corpus = merged
    }
  }

  test("e48: iteration chaining and count invariants hold") {
    val rows = CurationOps.e48BpeMerge(spark, sf).collect()
    val Array(r1, r2) = rows
    assert(r1.getLong(6) == r2.getLong(5),
      "iter2 starts from iter1's rewritten corpus")
    rows.foreach { r =>
      assert(r.getLong(4) >= 1 && r.getLong(4) <= r.getLong(3),
        "greedy merges are positive and never exceed the overlapping count")
      assert(r.getLong(5) - r.getLong(4) == r.getLong(6))
    }
  }

  test("e48b: eight looped merges match the sequential greedy reference exactly") {
    val rows = CurationOps.e48bBpeTrainN(spark, sf, 8).collect()
    assert(rows.length == 8)
    var corpus = fixtureTokens()
    for (it <- 1 to 8) {
      val r = rows(it - 1)
      val ((a, b), n) = bestPair(corpus)
      val before = corpus.map(_.length.toLong).sum
      val merged = corpus.map(greedyMerge(_, a, b))
      val after = merged.map(_.length.toLong).sum
      assert(r.getInt(0) == it)
      assert((r.getString(1), r.getString(2)) == ((a, b)), s"iter $it adopted pair")
      assert(r.getLong(3) == n, s"iter $it n_occ")
      assert(r.getLong(4) == before - after,
        s"iter $it greedy merge count — the replace-encoding claim, looped")
      assert(r.getLong(5) == before && r.getLong(6) == after,
        s"iter $it token totals via the Σlen = Σpairs + n_docs identity")
      corpus = merged
    }
  }

  test("e48b: bit-identical to e48's unrolled form at the same merge count") {
    val unrolled = CurationOps.e48BpeMerge(spark, sf).collect().map(_.toSeq).toSeq
    val looped = CurationOps.e48bBpeTrainN(spark, sf, 2).collect().map(_.toSeq).toSeq
    assert(looped == unrolled,
      "the looped trainer and the lazy unrolled trainer are the same operator")
  }

  test("e48: no corpus-sized join — the argmax relation broadcasts") {
    val p = plan(CurationOps.e48BpeMerge(spark, sf))
    assert(!p.contains("SortMergeJoin"),
      "nothing corpus-sized may shuffle-join; the 1-row argmax broadcasts")
    assert(!p.contains("CartesianProduct"))
  }

  // --- e49 ---

  test("e49: a brute-force Scala cosine pass reproduces the flagged counts") {
    val rows = SimOps.e49SemanticDecon(spark, sf).collect()
    assert(rows.nonEmpty)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "label", "cast(embedding as array<double>) as v")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Double](2).toArray))
    val bench = vecs.filter(v => v._1 % 97 == 0 && v._1 < 100000L)
    val corpus = vecs.filter(v => !(v._1 % 97 == 0 && v._1 < 100000L))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      round6(d / (math.sqrt(na) * math.sqrt(nb)))
    }
    val maxCos = corpus.map { case (_, label, v) =>
      (label, bench.map(b => cos(v, b._3)).max)
    }
    // exact percentile, linear interpolation — Spark `percentile`
    val sorted = maxCos.map(_._2).sorted
    val rank = 0.99 * (sorted.length - 1)
    val (lo, hi) = (sorted(rank.toInt), sorted(math.ceil(rank).toInt))
    val p99 = round6(lo + (rank - rank.toInt) * (hi - lo))
    val byLabel = maxCos.groupBy(_._1)
    rows.foreach { r =>
      val mine = byLabel(r.getInt(0))
      assert(r.getLong(1) == mine.length, "n_vecs")
      assert(r.getLong(2) == mine.count(_._2 >= p99), "n_flagged")
      assert(r.getDouble(4) == p99, "p99 bar")
    }
    assert(rows.map(_.getLong(2)).sum >= 1, "the adaptive bar must flag someone")
  }

  test("e49: benchmark side broadcasts; the corpus never shuffle-joins") {
    val p = plan(SimOps.e49SemanticDecon(spark, sf))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the eval suite is broadcast-sized; shuffling the corpus to meet it " +
        "is the 100 TB anti-pattern")
  }
}
