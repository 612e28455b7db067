package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.SimOps

/** The TRAINED IVF index with its BUILD split from its SERVE — the r11
  * verdict's one weak, closed: e2i/e2t proved the layout and the
  * trained chain, but every measured configuration either lost to the
  * flat scan (e2i's 10k micro-cells made directory listing dominate)
  * or paid training inside the timed probe (e2t). Here the whole build
  * — train the coarse quantizer, assign the corpus, write the
  * cell-partitioned inverted lists, stage the bounded query set — runs
  * ONCE under the suite-wide `ensure` staleness contract (the
  * e61b/e62 precedent: source (size, mtime) signature + a build
  * version prefix), and the DECLARED keys are probe-only:
  *
  *  - [[e2vIvfServe]]  — nprobe=1: the query's own trained cell;
  *  - [[e2wIvfMultiprobe]] — nprobe=4: the four nearest trained cells
  *    (production IVF's recall knob — e2r's multi-probe stance moved
  *    from LSH buckets onto the trained quantizer);
  *  - [[e2aFilteredAnn]] — an ATTRIBUTE predicate pushed into the
  *    probed cell scan (partition pruning on `cell` AND row-level
  *    `PushedFilters` on `label` against the same parquet) — the
  *    production vector-search shape: filter-during-probe, exact
  *    rescore of survivors.
  *
  * Cell count is a production shape, not the fixture's label
  * cardinality: k = 64 (≈ √N across the fixture decades — e2i's
  * inversion came precisely from 10k micro-cells at ~200 vectors
  * each). A probe reads ≤ |query cells| of 64 directories; the scan
  * volume is ~nprobe/64 of the corpus, which is the claim an IVF
  * index exists to make, and IvfServeSpec + SCALE.md measure it
  * (dirs read vs present, probe seconds vs e2's flat scan).
  *
  * Correctness is END-TO-END oracle-gated like e2t: the DuckDB oracle
  * replays the seeding, the one Lloyd recompute round (the e65b
  * one-round discipline — half e2t's CTE chain, with k=64 instead of
  * 8), the corpus assignment that partitions the index, the probe
  * cell choice, and the in-cell exact top-3 — drift anywhere in
  * train → persist → probe is a hash miss.
  *
  * 100 TB path: the build is one corpus scan per training round plus
  * one hash exchange on the trained cell (any bucketed-table build);
  * after it EVERY probe reads nprobe/k of the corpus through Spark
  * PartitionFilters, re-ranking confined to the probed lists, query
  * assignment a k×dim driver-side fold. Staleness re-stages on source
  * change exactly as [[PartitionedLayout]]/[[ZOrderLayout]]. */
object IvfServe {

  /** Trained cell count — the production √N shape (see scaladoc). */
  val K = 64

  /** Declared multi-probe width for [[e2wIvfMultiprobe]]. */
  val NProbe = 4

  def serveDir(d: String): String =
    sys.env.getOrElse("GRAFT_FIXTURE_DIR", "/root/repo/target/fixtures") +
      s"/embeddings_ivf_serve/${graft.util.PathKeys.keyedName(d)}"

  /** The corpus with its double view beside the original float column
    * (the floats land in the lists byte-identical; every cosine/d2
    * runs on the cast doubles both engines compute). */
  private def corpus(s: SparkSession, d: String): DataFrame =
    Tables.spreadIfNarrow(Tables.embeddings(s, d), col("vec_id"))
      .select(col("vec_id"), col("label"), col("embedding"),
        col("embedding").cast("array<double>").as("v"))

  /** One-time BUILD: train (seeds + one Lloyd recompute), persist the
    * k trained centroids, the cell-partitioned inverted lists (label
    * kept — the filtered-ANN attribute), and the bounded declared
    * query set (vec_id < 8 — staged because a production query vector
    * arrives WITH the request; re-scanning the corpus for it would
    * charge the probe a cost serving never pays). The marker is
    * written LAST so a partial build re-stages. */
  def ensure(s: SparkSession, d: String): Unit = synchronized {
    import java.nio.file.{Files, Paths}
    val srcPath = Paths.get(d, "embeddings.parquet")
    val sig =
      s"s1:k=$K:${Files.size(srcPath)}:${Files.getLastModifiedTime(srcPath).toMillis}"
    val root = serveDir(d)
    val marker = Paths.get(root, "_STAGED_SIG")
    val stale = !Files.exists(marker) ||
      new String(Files.readAllBytes(marker), "UTF-8") != sig
    if (stale) {
      graft.streaming.DocStreams.deleteTree(Paths.get(root))
      buildTrainedLayout(s, root, corpus(s, d))
      Tables.embeddings(s, d).where(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("embedding"))
        .coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$root/queries")
      Files.write(marker, sig.getBytes("UTF-8"))
    }
  }

  /** The shared BUILD leg (also the e2f fold stream's base build over
    * a filtered corpus): train k centroids on `base`, persist them and
    * the cell-partitioned inverted lists under `root`. */
  private[graft] def buildTrainedLayout(s: SparkSession, root: String,
      base: DataFrame): Seq[(Int, Seq[Double])] = {
    val cents = SimOps.trainCoarseCentroids(base.select("vec_id", "v"), K)
    import s.implicits._
    cents.toDF("cid", "c").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$root/centroids")
    base
      .select(col("vec_id"), col("label"), col("embedding"),
        SimOps.bestCentroid(col("v"), cents).getField("cid").as("cell"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cell")
      .parquet(s"$root/lists")
    cents
  }

  /** The double-view corpus rooted at a table dir — shared with the
    * fold stream's base/arrival split. */
  private[graft] def corpusView(s: SparkSession, d: String): DataFrame = corpus(s, d)

  /** The persisted trained centroids under `root` — k rows, bounded
    * by the model. */
  private[graft] def centroidsAt(s: SparkSession, root: String): Seq[(Int, Seq[Double])] =
    s.read.parquet(s"$root/centroids")
      .collect().toSeq
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1)

  private[graft] def centroids(s: SparkSession, d: String): Seq[(Int, Seq[Double])] =
    centroidsAt(s, serveDir(d))

  /** The staged query set with its trained-cell probes (nprobe cells
    * per query, nearest first), exploded one row per (query, cell). */
  private def probedQueries(s: SparkSession, d: String,
      cents: Seq[(Int, Seq[Double])], nprobe: Int): DataFrame =
    s.read.parquet(s"${serveDir(d)}/queries")
      .select(col("q_id"), col("embedding").cast("array<double>").as("qv"))
      .withColumn("cell",
        explode(SimOps.centroidProbes(col("qv"), cents, nprobe)))

  /** The probed inverted lists: `cell IN (...)` prunes to the probed
    * directories before any I/O (PartitionFilters — pinned in
    * IvfServeSpec). */
  private def probedLists(s: SparkSession, d: String, cells: Seq[Int]): DataFrame =
    s.read.parquet(s"${serveDir(d)}/lists")
      .where(col("cell").isin(cells.map(Int.box): _*))

  private def rescored(lists: DataFrame, q: DataFrame): DataFrame =
    lists
      .select(col("vec_id").as("cand_id"), col("cell"),
        col("embedding").cast("array<double>").as("v"))
      .join(broadcast(q), Seq("cell"))
      .where(col("cand_id") =!= col("q_id"))
      .select(col("q_id"), col("cand_id"),
        round(graft.functions.GraftFunctions.cosine(col("qv"), col("v")), 6)
          .as("cos_sim"))

  /** The distinct cells a probe of the staged query set touches —
    * spec-side measurement hook (dirs read vs present). */
  private[graft] def probedCells(s: SparkSession, d: String, nprobe: Int): Seq[Int] = {
    ensure(s, d)
    probedQueries(s, d, centroids(s, d), nprobe)
      .select("cell").distinct().collect().map(_.getInt(0)).sorted.toSeq
  }

  private def probe(s: SparkSession, d: String, nprobe: Int): DataFrame = {
    ensure(s, d)
    val cents = centroids(s, d)
    val q = probedQueries(s, d, cents, nprobe)
    val cells = q.select("cell").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq // ≤ 8 queries × nprobe
    SimOps.topK(rescored(probedLists(s, d, cells), q), 3)
  }

  /** E2v: the PROBE-ONLY trained-IVF key — nprobe=1. The number this
    * key exists to put on the board: probe seconds < e2's flat-scan
    * seconds at the same SF (SCALE.md), because only ~|query cells|/64
    * of the corpus is read. */
  def e2vIvfServe(s: SparkSession, d: String): DataFrame = probe(s, d, 1)

  /** E2w: MULTI-PROBE through the same layout — each query sweeps its
    * [[NProbe]] nearest trained cells (recall→1 as nprobe→k; the
    * recall/cost trajectory beside e2t's 0.917 is measured in
    * IvfServeSpec and SCALE.md). Candidate sets strictly contain
    * e2v's, so per-query recall can only grow — the e2p superset
    * argument on trained cells. */
  def e2wIvfMultiprobe(s: SparkSession, d: String): DataFrame =
    probe(s, d, NProbe)

  /** E2a: FILTERED ANN — an attribute predicate (`label < 5`) applied
    * DURING the probe, not after it: the probed cell directories prune
    * at partition level AND the label predicate pushes to the parquet
    * row groups of the same scan (both layers visible in the plan and
    * measured in IvfServeSpec), then exact rescore of the survivors.
    * The candidate's label ships in the output so the declared rows
    * prove the filter held. */
  def e2aFilteredAnn(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    ensure(s, d)
    val cents = centroids(s, d)
    val q = probedQueries(s, d, cents, 1)
    val cells = q.select("cell").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    val scored = probedLists(s, d, cells)
      .where(col("label") < 5)
      .select(col("vec_id").as("cand_id"), col("cell"),
        col("label").as("cand_label"),
        col("embedding").cast("array<double>").as("v"))
      .join(broadcast(q), Seq("cell"))
      .where(col("cand_id") =!= col("q_id"))
      .select(col("q_id"), col("cand_id"), col("cand_label"),
        round(graft.functions.GraftFunctions.cosine(col("qv"), col("v")), 6)
          .as("cos_sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("cand_id"), col("cand_label"),
        col("cos_sim"))
      .orderBy("q_id", "rank")
  }
}
