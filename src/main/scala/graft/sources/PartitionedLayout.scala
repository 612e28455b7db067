package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Hive-style partitioned parquet layout + partition-pruned scans — the
  * storage-level analogue of the reference's per-dataset scrape scoping
  * (`web_scrpaer_2.py:475-476`: only the requested datasets are visited).
  *
  * At 100 TB the fact tables are laid out partitioned by their scan key
  * (here: orders by o_orderstatus); a predicate on the partition column
  * then prunes whole directories BEFORE any I/O — visible in the plan as
  * `PartitionFilters` + a reduced `PartitionCount`, which
  * PartitionPruningSpec asserts. This is directory-level pruning, a
  * separate mechanism from the row-group `PushedFilters` that
  * PlanShapeSpec checks on flat scans.
  */
object PartitionedLayout {

  /** Layout path is per scale factor — the same session may verify at
    * one SF and test at another. Keyed by basename PLUS a hash of the
    * full source path so two roots with the same basename never collide. */
  def layoutDir(d: String): String =
    sys.env.getOrElse("GRAFT_FIXTURE_DIR", "/root/repo/target/fixtures") +
      s"/orders_by_status/${graft.util.PathKeys.keyedName(d)}"

  /** One-time: write orders partitioned by status. Staleness is the
    * source's exact (size, mtime) signature, not just _SUCCESS — a
    * regenerated orders.parquet at the same path must invalidate the
    * derived layout, or the pruned scan silently serves old data. */
  def ensure(s: SparkSession, d: String): Unit = synchronized {
    import java.nio.file.{Files, Paths}
    val srcPath = Paths.get(d, "orders.parquet")
    val sig =
      s"${Files.size(srcPath)}:${Files.getLastModifiedTime(srcPath).toMillis}"
    val marker = Paths.get(layoutDir(d), "_STAGED_SIG")
    val stale = !new java.io.File(s"${layoutDir(d)}/_SUCCESS").exists() ||
      !Files.exists(marker) ||
      new String(Files.readAllBytes(marker), "UTF-8") != sig
    if (stale) {
      orders(s, d).write.mode(SaveMode.Overwrite)
        .partitionBy("o_orderstatus")
        .parquet(layoutDir(d))
      Files.write(marker, sig.getBytes("UTF-8"))
    }
  }

  /** Partition-pruned scan: only the o_orderstatus=F directory is read. */
  def prunedScan(s: SparkSession, d: String): DataFrame = {
    ensure(s, d)
    s.read.parquet(layoutDir(d))
      .where(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      .orderBy("o_orderkey")
  }
}
