package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** Semantics + plan-shape coverage for the r7 curation stages
  * (CurationOps): decontamination, repetition rules, span redaction,
  * sequence packing, stratified sampling, n-gram stats, CSV round-trip.
  * Each op's DuckDB oracle is the authoritative gate; these tests pin
  * the invariants the oracle can't see (plan shape, operator reuse) and
  * recompute small-scale answers through an independent Scala path. */
class CurationOpsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def tokensOf(text: String): Seq[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  test("e20: benchmark docs never appear in the output; threshold splits the corpus") {
    val rows = CurationOps.e20Decontaminate(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !(r.getLong(0) % 23 == 7 && r.getLong(0) < 100000L)),
      "benchmark members must be excluded")
    val flags = rows.map(_.getBoolean(2)).toSet
    assert(flags == Set(true, false) || flags == Set(false),
      "is_contaminated must agree with the n_overlap >= 4 threshold")
    assert(rows.forall(r => r.getBoolean(2) == (r.getLong(1) >= 4)))
  }

  test("e20: benchmark side is broadcast; no cartesian product") {
    val p = plan(CurationOps.e20Decontaminate(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      "the eval-suite shingle set must broadcast — shuffling the corpus to join " +
        "a benchmark-sized set is the 100 TB anti-pattern")
    assert(!p.contains("CartesianProduct"))
  }

  test("e10b: repetition fractions match an independent Scala recomputation") {
    val got = CurationOps.e10bGopherRepetition(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == docs.count { case (_, t) => tokensOf(t).nonEmpty })
    for ((id, text) <- docs.take(50) if tokensOf(text).nonEmpty) {
      val w = tokensOf(text)
      val topN = w.groupBy(identity).values.map(_.size).max
      val bg = w.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val r = got(id)
      assert(r.getInt(1) == w.size, s"doc $id n_tokens")
      assert(math.abs(r.getDouble(2) - BigDecimal(topN.toDouble / w.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"doc $id top_word_frac")
      if (bg.nonEmpty)
        assert(math.abs(r.getDouble(4) - BigDecimal(1 - bg.distinct.size.toDouble / bg.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"doc $id dup_bigram_frac")
    }
  }

  test("e10b and e21 are pure per-row pipelines: no join, no window function") {
    for (df <- Seq(CurationOps.e10bGopherRepetition(spark, sf),
                   CurationOps.e21PiiScrub(spark, sf))) {
      val p = plan(df)
      assert(!p.contains("Join") && !p.contains("Window "),
        "quality rules and scrubbing must run at scan bandwidth")
    }
  }

  test("e21: scrubbed payloads carry no digits; span count matches a regex recount") {
    val rows = CurationOps.e21PiiScrub(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !r.getString(1).exists(_.isDigit)),
      "a digit surviving the scrub is a redaction failure")
    val re = "[0-9]+".r
    val payloads = graft.Tables.events(spark, sf)
      .select(col("event_id"), concat_ws(" ", col("props"),
        concat(lit("uid="), col("user_id")),
        concat(lit("ev="), col("event_type"))).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for (r <- rows.take(100))
      assert(r.getInt(2) == re.findAllIn(payloads(r.getLong(0))).size)
  }

  test("e22: packing is exhaustive, contiguous per shard, and offset-consistent") {
    val rows = CurationOps.e22SeqPack(spark, sf).collect()
    val totalDocs = rows.map(_.getLong(2)).sum
    assert(totalDocs == graft.Tables.documents(spark, sf).count())
    rows.groupBy(_.getString(0)).foreach { case (src, ws) =>
      val ids = ws.map(_.getLong(1)).sorted
      assert(ids.head == 0 && ids.toSeq == (0L until ids.size),
        s"source $src windows must be contiguous from 0")
      // doc ranges of consecutive windows must not interleave
      val byWin = ws.sortBy(_.getLong(1))
      byWin.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(5) < b.getLong(4),
          s"source $src: window ${a.getLong(1)} overlaps ${b.getLong(1)}")
        case _ =>
      }
    }
  }

  test("e14b: runs on the TopKPerKey operator and matches the window-idiom answer") {
    val df = CurationOps.e14bStratifiedSample(spark, sf)
    assert(plan(df).contains("TopKPerKey"),
      "stratified sampling must use the bounded-heap operator, not a full stratum sort")
    val got = df.collect()
    val perLang = got.groupBy(_.getString(0))
    val sizes = graft.Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, n) <- sizes)
      assert(perLang(lang).length == math.min(20L, n),
        s"stratum $lang must yield min(k, stratum size) rows")
    // cross-check the selection against the row_number idiom
    import org.apache.spark.sql.expressions.Window
    val viaWindow = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        md5(concat_ws("|", col("text"), col("doc_id"))).as("sample_key"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy("sample_key", "doc_id")))
      .where(col("rn") <= 20)
      .select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got.map(r => (r.getString(0), r.getLong(2))).toSet == viaWindow)
  }

  test("e23: top-50 tail is TakeOrdered, and counts match a Scala recount") {
    val df = CurationOps.e23NgramStats(spark, sf)
    assert(plan(df).contains("TakeOrderedAndProject"),
      "a global Sort for a LIMIT 50 is the wrong plan at any scale")
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 50)
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text").collect()
    val occur = scala.collection.mutable.Map.empty[String, Long]
    val dfreq = scala.collection.mutable.Map.empty[String, Set[Long]]
    for (r <- docs; bg <- tokensOf(r.getString(1)).sliding(2) if bg.size == 2) {
      val k = bg.mkString(" ")
      occur(k) = occur.getOrElse(k, 0L) + 1
      dfreq(k) = dfreq.getOrElse(k, Set.empty) + r.getLong(0)
    }
    val want = occur.toSeq.map { case (k, n) => (k, n, dfreq(k).size.toLong) }
      .sortBy { case (k, n, _) => (-n, k) }.take(50)
    assert(got.toSeq == want)
  }

  test("e24: weight dim is broadcast; realized rates track targets; boosted sources sample more") {
    val df = CurationOps.e24MixtureWeights(spark, sf)
    assert(plan(df).contains("BroadcastHashJoin"),
      "a mixture config is a handful of rows — it must broadcast")
    val rows = df.collect()
    assert(rows.map(_.getLong(1)).sum == graft.Tables.documents(spark, sf).count())
    for (r <- rows) {
      val (nDocs, nSampled, target, realized) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(nSampled <= nDocs)
      assert(Set(0.75, 0.25).contains(target))
      // a deterministic-hash Bernoulli at these stratum sizes stays
      // within a wide band of its rate (binomial tail, not flakiness:
      // the draw is a pure function of doc_id)
      assert(math.abs(realized - target) < 0.35, s"${r.getString(0)}: $realized vs $target")
    }
    val boosted = rows.filter(_.getDouble(3) == 0.75).map(_.getDouble(4))
    val base = rows.filter(_.getDouble(3) == 0.25).map(_.getDouble(4))
    assert(boosted.min > base.max,
      "every boosted source must realize a higher rate than every base source")
  }

  test("e10s: streaming gate routes every doc exactly once, verdicts equal batch rules") {
    val manifest = graft.streaming.DocStreams.e10sQualityStream(spark, sf).collect()
    val total = manifest.map(r => r.getLong(1) + r.getLong(2)).sum
    assert(total == graft.Tables.documents(spark, sf).count(),
      "admitted + rejected must partition the corpus")
    // verdict parity: the drained per-doc flags equal the batch rule set
    val work = java.nio.file.Paths.get(
      sys.env.getOrElse("GRAFT_FIXTURE_DIR", "/root/repo/target/fixtures"),
      "stream-e10s", graft.util.PathKeys.keyedName(sf) + "-4")
    val drained = graft.streaming.DocStreams.drainedGate(spark, work)
      .select("doc_id", "passes_repetition")
    val batch = CurationOps.repetitionMetrics(graft.Tables.documents(spark, sf))
      .select("doc_id", "passes_repetition")
    assert(drained.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(drained).count() == 0)
  }

  test("e10s: gate survives a stop/restart without dropping or double-routing docs") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft-e10s-recov")
    val landing = base.resolve("landing")
    val work = base.resolve("work")
    Files.createDirectories(landing)
    graft.streaming.DocStreams.docsStreamBucketed(spark, sf, 4) // ensure staging
    val staged = java.nio.file.Paths.get(
      sys.env.getOrElse("GRAFT_FIXTURE_DIR", "/root/repo/target/fixtures"),
      "stream-docs-bucketed", graft.util.PathKeys.keyedName(sf) + "-4")
    val parts = Files.list(staged)
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .sorted().toArray.map(_.asInstanceOf[java.nio.file.Path])
    def runOnce(): Unit = graft.streaming.DocStreams.e10sGateDrain(spark,
      spark.readStream.schema(graft.streaming.DocStreams.docsSchema)
        .option("maxFilesPerTrigger", 1).parquet(landing.toString),
      work)
    parts.take(2).foreach(p => Files.copy(p, landing.resolve(p.getFileName)))
    runOnce()
    parts.drop(2).foreach(p => Files.copy(p, landing.resolve(p.getFileName)))
    runOnce()
    val drained = graft.streaming.DocStreams.drainedGate(spark, work)
    assert(drained.groupBy("doc_id").count().where(col("count") > 1).count() == 0,
      "a doc routed twice — replayed batch did not overwrite its own output")
    assert(drained.count() == graft.Tables.documents(spark, sf).count(),
      "a doc was lost across the restart")
  }

  test("s7: the CSV round-trip is lossless against the direct projection") {
    val round = SourceSink.s7CsvRoundtrip(spark, sf)
    val direct = graft.Tables.lineitem(spark, sf)
      .where(col("l_orderkey") < 100)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
    assert(round.count() == direct.count())
    assert(round.exceptAll(direct).isEmpty && direct.exceptAll(round).isEmpty)
  }
}
