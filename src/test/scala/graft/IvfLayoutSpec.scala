package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.IvfLayout
import graft.ops.SimOps

/** e2i — persisted IVF index layout (r10 verdict ask #3). Claims:
  * the probed scan returns EXACTLY e2's rows (the layout changes the
  * plan, never the answer — shared oracle), the scan actually PRUNES
  * (PartitionFilters on the cell key; directories read strictly fewer
  * than directories present once un-probed cells exist), and the
  * staleness signature re-stages on source change. */
class IvfLayoutSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("e2i rows equal e2's (bit-identical ranking through the layout)") {
    val viaIndex = IvfLayout.e2iIvfIndexScan(spark, sf)
      .collect().map(_.toSeq).toSeq
    val inPlan = SimOps.e2CosineTopk(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(viaIndex.nonEmpty && viaIndex == inPlan)
  }

  test("probe scan carries PartitionFilters on cell and reads only probed directories") {
    val df = IvfLayout.e2iIvfIndexScan(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    val scanLine = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("cell"),
      s"cell predicate must prune directories, not filter rows: $scanLine")
    // directory-level measurement on the real layout (the e62
    // footer-measure stance): cells present vs cells probed
    val root = new java.io.File(IvfLayout.layoutDir(sf))
    val present = root.listFiles().filter(f =>
      f.isDirectory && f.getName.startsWith("cell=")).map(_.getName).sorted
    val probed = IvfLayout.probeCells(spark, sf).map(c => s"cell=$c")
    assert(present.nonEmpty, "layout must exist after ensure()")
    assert(probed.toSet.subsetOf(present.toSet))
    // at sf0.01 the 8-query probe set covers a strict subset of cells;
    // if the fixture ever degenerates to probe-all, the pruning claim
    // is vacuous and this must fail loudly
    assert(probed.length < present.length,
      s"probe must touch fewer lists than exist: ${probed.length}/${present.length}")
    // and the pruned-out cells never produce candidate rows: every
    // ranked candidate's cell is a probed cell (rows prove the I/O
    // claim the PartitionFilters line makes)
    val candCells = spark.read.parquet(IvfLayout.layoutDir(sf))
      .where(col("cell").isin(IvfLayout.probeCells(spark, sf).map(Int.box): _*))
      .select("cell").distinct().collect().map(r => s"cell=${r.getInt(0)}").toSet
    assert(candCells.subsetOf(probed.toSet))
  }

  test("e2t: candidates come from the query's TRAINED cell; recall beats the label cells") {
    import graft.sources.IvfLayout
    val got = IvfLayout.e2tTrainedIvfScan(spark, sf).collect()
    assert(got.nonEmpty)
    // ranked per (cos desc, cand_id) within each query
    got.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_.getInt(1))
      byRank.sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(3) >= b.getDouble(3), s"q$q rank order")
        case _ =>
      }
    }
    // the trained quantizer is GEOMETRIC where the synthetic label is
    // not (e2r measured label-IVF recall 0.04–0.25) — recall@3 against
    // the exact full-corpus top-3 must not be worse through trained
    // cells; the measured pair is the e2r-style evidence row
    val v = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def exactTop3(q: Long): Set[Long] =
      v.toSeq.filter(_._1 != q)
        .map { case (c, x) => (c, cos(v(q), x)) }
        .sortBy { case (c, s2) => (-s2, c) }.take(3).map(_._1).toSet
    def recall(rows: Array[org.apache.spark.sql.Row]): Double = {
      val byQ = rows.groupBy(_.getLong(0))
      byQ.map { case (q, rs) =>
        rs.map(_.getLong(2)).toSet.intersect(exactTop3(q)).size / 3.0
      }.sum / byQ.size
    }
    val trained = recall(got)
    val label = recall(graft.ops.SimOps.e2CosineTopk(spark, sf).collect())
    info(f"recall@3: label cells $label%.3f -> trained cells $trained%.3f")
    assert(trained >= label,
      f"trained cells must not lose recall vs synthetic labels: $trained%.3f < $label%.3f")
  }

  test("staleness: touching the source re-stages the layout") {
    // on a COPY of the fixture (the source dir is read-only): ensure,
    // bump the source mtime, ensure again — the staged signature must
    // change, i.e. the layout actually re-staged (r11 advice: the old
    // form only checked the marker's format)
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = Files.createTempDirectory("ivf-stale")
    try {
      Files.copy(Paths.get(sf, "embeddings.parquet"),
        tmp.resolve("embeddings.parquet"), StandardCopyOption.REPLACE_EXISTING)
      val d = tmp.toString
      IvfLayout.ensure(spark, d)
      val marker = Paths.get(IvfLayout.layoutDir(d), "_STAGED_SIG")
      val before = new String(Files.readAllBytes(marker), "UTF-8")
      assert(before.nonEmpty && before.contains(":"),
        "signature must carry size:mtime of the source")
      // +2s: coarse-mtime filesystems must still observe the change
      val src = tmp.resolve("embeddings.parquet")
      Files.setLastModifiedTime(src, java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(src).toMillis + 2000))
      IvfLayout.ensure(spark, d)
      val after = new String(Files.readAllBytes(marker), "UTF-8")
      assert(after != before,
        s"touched source must re-stage the layout: signature unchanged ($before)")
      graft.streaming.DocStreams.deleteTree(
        Paths.get(IvfLayout.layoutDir(d)))
    } finally graft.streaming.DocStreams.deleteTree(tmp)
  }
}
