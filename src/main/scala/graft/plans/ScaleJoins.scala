package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Join strategies for the 100 TB design point that the operator
  * inventory itself doesn't force at test scale:
  *
  *  - **Bucketed co-located join** (`bucketedJoinDemo`): both fact tables
  *    written bucketed+sorted by the join key; the sort-merge join then
  *    runs with ZERO Exchange (asserted in ScaleJoinSpec). At 100 TB this
  *    is the difference between re-shuffling both inputs per query and
  *    reading co-located buckets.
  *  - **Salted skew join** (`saltedJoin`): when one key carries a
  *    disproportionate share of rows, the build side is replicated
  *    `saltBuckets` ways and the probe side's key is salted, splitting
  *    the hot partition into `saltBuckets` tasks. AQE's skew-join
  *    handling covers sort-merge cases automatically; explicit salting
  *    remains the portable fallback (e.g. for aggregations or
  *    pre-AQE-partitioned writes).
  */
object ScaleJoins {

  /** Salted equi-join of `big` (skewed on `key`) against `dim`:
    * semantically identical to `big.join(dim, key)` — ScaleJoinSpec
    * asserts equality — but the hot key's rows spread over
    * `saltBuckets` partitions. */
  def saltedJoin(
      big: DataFrame, dim: DataFrame, key: String, saltBuckets: Int): DataFrame = {
    // The salt must be DETERMINISTIC per row: deriving it from
    // monotonically_increasing_id would change across task retries after
    // a shuffle and silently drop/duplicate rows (SPARK-23207 class).
    // Hashing all row values is stable; rows that are fully identical
    // share a salt, which only matters for pure-duplicate skew.
    val salted = big.withColumn("_salt",
      pmod(hash(big.columns.map(col): _*), lit(saltBuckets)))
    val explodedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1)).cast("array<int>")))
    salted.join(explodedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Declared-query form of the salted join (x3_salted_agg): lineitem's
    * return flag carries only 3 distinct values — a genuinely skewed
    * join key at ANY scale — decoded against a tiny dim through
    * [[saltedJoin]] so the hot keys' rows spread over 8 salt buckets,
    * then aggregated. Semantically identical to the plain join (the
    * DuckDB oracle checks it); the salting changes only row placement. */
  def x3SaltedAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dim = Seq("R" -> "RETURNED", "A" -> "ACCEPTED", "N" -> "NONE")
      .toDF("l_returnflag", "flag_name")
    saltedJoin(
      lineitem(s, d).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"),
      dim, "l_returnflag", saltBuckets = 8)
      .groupBy("flag_name")
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity"))).cast("long").as("qty"))
      .orderBy("flag_name")
  }

  /** Table names are keyed by the scale-factor dir so the same session
    * can verify at one SF and bench at another without silently reusing
    * stale bucketed data. */
  private def bktName(base: String, d: String): String =
    s"${base}_bkt_${graft.util.PathKeys.pathKey(d)}"

  /** One-time setup: write orders + lineitem bucketed by the join key
    * into the session warehouse (local stand-in for the curated bucketed
    * layout a 100 TB deployment maintains). */
  def ensureBucketed(s: SparkSession, d: String, buckets: Int = 8): Unit = synchronized {
    val (ot, lt) = (bktName("orders", d), bktName("lineitem", d))
    // staleness gate: regenerated source data at the same path must not
    // silently reuse old bucketed copies — compare source mtimes against
    // a marker written when the tables were built
    val srcM = Seq("orders.parquet", "lineitem.parquet")
      .map(f => new java.io.File(d, f).lastModified).max
    val wh0 = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val marker = new java.io.File(wh0, s"$ot-src-mtime")
    val fresh = s.catalog.tableExists(ot) && s.catalog.tableExists(lt) &&
      marker.exists() &&
      scala.util.Try(java.nio.file.Files.readString(marker.toPath).trim.toLong)
        .toOption.contains(srcM)
    if (!fresh) {
      // the in-memory catalog forgets tables across sessions while their
      // files persist — clear stale locations before re-creating
      val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      for (t <- Seq(ot, lt)) {
        val dir = new java.io.File(wh, t)
        if (dir.exists()) {
          import scala.reflect.io.Directory
          new Directory(dir).deleteRecursively()
        }
      }
      orders(s, d).write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(ot)
      lineitem(s, d).write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(lt)
      marker.getParentFile.mkdirs()
      java.nio.file.Files.writeString(marker.toPath, srcM.toString)
    }
  }

  /** The co-located join: orders_bkt ⋈ lineitem_bkt on the bucket key —
    * planned as a SortMergeJoin with no Exchange on either side. The
    * merge hint pins the strategy (at test scale AQE would broadcast the
    * tiny side instead; at 100 TB neither side broadcasts and SMJ over
    * co-located buckets IS the plan). The bucketed distribution also
    * feeds the downstream per-key aggregation shuffle-free. */
  def bucketedJoinDemo(s: SparkSession, d: String): DataFrame = {
    ensureBucketed(s, d)
    s.table(bktName("orders", d)).hint("merge")
      .join(s.table(bktName("lineitem", d)), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_items"), round(sum(col("l_quantity"))).cast("long").as("qty"))
      .orderBy("o_orderkey")
  }
}
