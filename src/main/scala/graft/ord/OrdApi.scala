package graft.ord

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's five user-facing scrape modes
  * (`/root/reference/web_scrpaer_2.py:291-334,509-527`: all /
  * specific_datasets / uniform_range / custom_ranges / single_target)
  * re-expressed as a library query API over the ORD data. A user of the
  * reference's CLI switches to these calls one-for-one.
  *
  * Range semantics are the reference's exactly: 1-based, end-inclusive,
  * clamped (`web_scrpaer_2.py:283-286` for datasets, `425-429` for
  * reactions) — pinned by OrdApiSpec. Dataset order is the catalog's
  * (file, dataset_id) order; reaction order is stored arrival order
  * (`rx_pos`), both made explicit so results are deterministic.
  */
object OrdApi {

  /** One row per reaction, with positional metadata for range slicing.
    * Dataset position follows CATALOG order on both axes: files in
    * their `OrdFixtures.files` declaration order (NOT an alphabetical
    * re-sort of names, which would put `_single` before `_three`/`_two`
    * and silently renumber everything) and, within a file, the stored
    * key order (the reference's scrape-arrival order, `ds_pos` in the
    * model). When a corpus scope is given, numbering is WITHIN that
    * corpus — "dataset 2 of file X", which is what a range over a
    * scoped catalog means. */
  private def catalog(
      s: SparkSession, corpus: Option[String] = None): DataFrame = {
    OrdFixtures.ensure(s)
    import org.apache.spark.sql.expressions.Window
    val fileIdx = element_at(
      typedlit(OrdFixtures.files.zipWithIndex.toMap), col("file"))
    val base = s.read.parquet(OrdFixtures.nestedPath)
    val ds = corpus.fold(base)(f => base.where(col("file") === f))
      .withColumn("ds_pos", // 1-based over (catalog file order, stored order)
        row_number().over(Window.orderBy(fileIdx, col("ds_pos"))))
    ds.select(col("file"), col("dataset_id"), col("ds_pos"),
        explode(col("reactions")).as("rx"))
      .select(col("file"), col("dataset_id"), col("ds_pos"),
        (col("rx.rx_pos") + 1).as("rx_pos1"), // 1-based like the reference's UI
        col("rx.reaction_id").as("reaction_id"),
        col("rx.success").as("success"))
  }

  /** Mode 1: everything. */
  def allReactions(s: SparkSession): DataFrame =
    catalog(s).orderBy("ds_pos", "rx_pos1")

  /** The golden corpus ships five files with OVERLAPPING dataset ids
    * (the same dataset appears in e.g. `_three` and the v2 file), so
    * id-addressed modes take an optional corpus (file) scope. */
  private def scoped(s: SparkSession, corpus: Option[String]): DataFrame =
    catalog(s, corpus)

  /** Mode 2: specific datasets by id (web_scrpaer_2.py:301-311). */
  def specificDatasets(
      s: SparkSession, ids: Seq[String],
      corpus: Option[String] = None): DataFrame =
    scoped(s, corpus).where(col("dataset_id").isin(ids: _*))
      .orderBy("ds_pos", "rx_pos1")

  /** Mode 3: uniform range — datasets [dsStart, dsEnd] and, within each,
    * reactions [rxStart, rxEnd]; 1-based, end-inclusive, clamped. With a
    * corpus scope the dataset index counts within that corpus. */
  def uniformRange(
      s: SparkSession, dsStart: Int, dsEnd: Int,
      rxStart: Int, rxEnd: Int, corpus: Option[String] = None): DataFrame =
    catalog(s, corpus)
      .where(col("ds_pos").between(math.max(dsStart, 1), dsEnd) &&
        col("rx_pos1").between(math.max(rxStart, 1), rxEnd))
      .orderBy("ds_pos", "rx_pos1")

  /** Mode 4: per-dataset custom ranges (web_scrpaer_2.py:313-326). */
  def customRanges(
      s: SparkSession, ranges: Map[String, (Int, Int)],
      corpus: Option[String] = None): DataFrame = {
    import s.implicits._
    val dim = ranges.toSeq.map { case (id, (a, b)) => (id, math.max(a, 1), b) }
      .toDF("dataset_id", "r_start", "r_end")
    scoped(s, corpus)
      .join(broadcast(dim), "dataset_id")
      .where(col("rx_pos1").between(col("r_start"), col("r_end")))
      .select(col("file"), col("dataset_id"), col("ds_pos"),
        col("rx_pos1"), col("reaction_id"), col("success"))
      .orderBy("ds_pos", "rx_pos1")
  }

  /** Mode 5: single target (degenerate ranges, web_scrpaer_2.py:517-527). */
  def singleTarget(
      s: SparkSession, datasetId: String, rxIndex: Int,
      corpus: Option[String] = None): DataFrame =
    scoped(s, corpus)
      .where(col("dataset_id") === datasetId && col("rx_pos1") === rxIndex)

  /** The reference's SAVE step (`json.dump(data, f, indent=2,
    * ensure_ascii=False)`, web_scrpaer_2.py:545-548): write the selected
    * datasets as one formatted-data JSON document, byte-compatible with
    * the golden files (OrdJson pins layout, escaping, float lexemes, and
    * the stored dataset order).
    *
    * Driver-side by design: this is where a curated, already-small
    * result leaves the cluster — the reference's output files are ≤650 KB.
    * Bulk exports belong to the distributed sink
    * (OrdPipeline.ordS6Sink / DataFrameWriter). */
  /** Driver-materialization guard for [[saveFormatted]]: max reaction
    * rows it will `collect()`. Overridable via `-Dgraft.ord.saveMaxRows=N`
    * for a host that KNOWS its driver heap; the default comfortably
    * covers the golden corpus (~200 reactions) with 3 orders of margin. */
  private[ord] def saveMaxRows: Long =
    sys.props.get("graft.ord.saveMaxRows")
      .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
      .getOrElse(200_000L)

  def saveFormatted(
      s: SparkSession, path: String,
      corpus: Option[String] = None, ids: Seq[String] = Nil): Unit = {
    OrdFixtures.ensure(s)
    import s.implicits._
    var df = s.read.parquet(OrdFixtures.nestedPath)
    corpus.foreach(f => df = df.where(col("file") === f))
    if (ids.nonEmpty) df = df.where(col("dataset_id").isin(ids: _*))
    // this sink collect()s to the driver by design (single pretty-printed
    // golden file); pointing it at an amplified fixture must fail fast
    // with a clear message, not OOM the driver
    val rxRow = df.agg(sum(size(col("reactions")))).head()
    val totalRx = if (rxRow.isNullAt(0)) 0L else rxRow.getLong(0)
    if (totalRx > saveMaxRows)
      throw new IllegalArgumentException(
        s"saveFormatted: selection has $totalRx reactions, above the " +
          s"driver-side cap of $saveMaxRows (this sink collects to the " +
          "driver for a single formatted JSON file). Narrow the selection " +
          "with corpus/ids, raise -Dgraft.ord.saveMaxRows if the driver " +
          "heap allows, or use the distributed sink (OrdPipeline.ordS6Sink).")
    val datasets = df.orderBy("file", "ds_pos").as[OrdDataset].collect().toSeq
    // the output document is a map keyed by dataset_id — the same id from
    // two source files cannot be represented (renderFile would silently
    // keep only the last); fail loudly instead of losing data
    val dupes = datasets.groupBy(_.dataset_id).filter(_._2.size > 1)
    if (dupes.nonEmpty)
      throw new IllegalArgumentException(
        "saveFormatted: dataset_id(s) appear in multiple source files and " +
          s"would collide in one JSON document: ${dupes.keys.mkString(", ")} — " +
          "scope with corpus=Some(file) or disjoint ids")
    OrdJson.writeFile(path, datasets)
  }
}
