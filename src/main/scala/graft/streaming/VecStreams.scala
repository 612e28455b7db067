package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.SimOps
import graft.sources.IvfServe

/** INCREMENTAL MAINTENANCE of the trained IVF layout (r11 verdict ask
  * #3): e6s grows the LSH band index per micro-batch, but nothing
  * folded newly-arriving VECTORS into the ANN cell layout — a
  * production vector index must serve a vector soon after it lands,
  * without retraining or rewriting the base lists. The e6s/e63s
  * protocol applied to [[IvfServe]]'s layout:
  *
  *  - the BASE corpus (vec_id ≥ [[ArrivalBound]]) is trained and
  *    persisted ONCE under the `ensure` staleness contract — the
  *    coarse quantizer is then FROZEN (production IVF retrains on a
  *    cadence, not per insert; a frozen quantizer keeps every already
  *    -written list valid);
  *  - arrivals (vec_id < [[ArrivalBound]]) land as file-source
  *    micro-batches; each batch is assigned to its trained cell
  *    map-side (the same [[SimOps.bestCentroid]] fold the build used)
  *    and appended as its own `batch=<id>` fold dir — a replayed id
  *    OVERWRITES its own dir, so at-least-once delivery cannot
  *    duplicate a vector (idempotence by layout, the e63s claim);
  *  - accumulated fold dirs compact via
  *    [[EventStreams.maybeCompactFolds]] with CONCATENATION as the
  *    re-merge (the fold rows are a set keyed by vec_id — compaction
  *    relocates, never re-aggregates), so probe listings stay
  *    O(RefreshCompactEvery) instead of O(batches);
  *  - a PROBE reads base lists (partition-pruned to the query cells)
  *    + the compacted folds (cell-filtered) — a vector arriving in
  *    batch N is visible to any probe after batch N (E2fStreamSpec).
  *
  * The declared key drains the arrival stream fresh (the e6s stance)
  * and probes: the DuckDB oracle replays base training (seeds
  * 16..79, one Lloyd recompute), assigns the WHOLE corpus — base and
  * arrivals alike — under the frozen centroids, and ranks the in-cell
  * top-3, so a fold that dropped, duplicated, or mis-assigned an
  * arriving vector is a hash miss.
  *
  * 100 TB path: per-batch work is one map-side assignment fold
  * (k×dim literal, no shuffle, no state store) + one bounded append;
  * the probe cost is the serve cost + O(folds-since-compaction); the
  * base is never rewritten. */
object VecStreams {

  /** vec_id < this arrive as the stream; the rest are the trained base. */
  val ArrivalBound = 16L

  private val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private[graft] def foldBaseDir(d: String): String =
    sys.env.getOrElse("GRAFT_FIXTURE_DIR", "/root/repo/target/fixtures") +
      s"/embeddings_ivf_fold/${graft.util.PathKeys.keyedName(d)}"

  /** One-time base build: train on vec_id ≥ [[ArrivalBound]] only —
    * the corpus that existed before the arrivals — and persist
    * centroids + base lists (the [[IvfServe]] build leg). */
  private[graft] def ensureFoldBase(s: SparkSession, d: String): Unit = synchronized {
    import java.nio.file.{Files, Paths}
    val srcPath = Paths.get(d, "embeddings.parquet")
    val sig = s"f4:k=${IvfServe.K}:b=$ArrivalBound:" + // f4: PQ codes encode residuals
      s"${Files.size(srcPath)}:${Files.getLastModifiedTime(srcPath).toMillis}"
    val root = foldBaseDir(d)
    val marker = Paths.get(root, "_STAGED_SIG")
    val stale = !Files.exists(marker) ||
      new String(Files.readAllBytes(marker), "UTF-8") != sig
    if (stale) {
      DocStreams.deleteTree(Paths.get(root))
      IvfServe.buildTrainedLayout(s, root,
        IvfServe.corpusView(s, d).where(col("vec_id") >= ArrivalBound))
      Files.write(marker, sig.getBytes("UTF-8"))
    }
  }

  /** Bucketed staging for the ARRIVING vectors: vec_id <
    * [[ArrivalBound]] split into `nBuckets` contiguous-range files
    * with staggered mtimes (the docsStreamBucketed protocol). */
  private[graft] def vecStreamBucketed(s: SparkSession, dir: String,
      nBuckets: Int): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    import scala.util.Using
    val src = Paths.get(dir, "embeddings.parquet")
    val landing = Paths.get(
      sys.env.getOrElse("GRAFT_FIXTURE_DIR", "/root/repo/target/fixtures"),
      "stream-vecs-bucketed",
      graft.util.PathKeys.keyedName(dir) + s"-$nBuckets")
    synchronized {
      val marker = landing.resolve("_STAGED")
      val sig = s"${Files.size(src)}:${Files.getLastModifiedTime(src).toMillis}"
      val bucketsPresent = (0 until nBuckets)
        .forall(i => Files.exists(landing.resolve(f"vecs-$i%03d.parquet")))
      val stale = !Files.exists(marker) || !bucketsPresent ||
        new String(Files.readAllBytes(marker), "UTF-8") != sig
      if (stale) {
        if (Files.exists(landing)) DocStreams.deleteTree(landing)
        Files.createDirectories(landing)
        val raw = s.read.schema(embSchema).parquet(src.toString)
          .where(col("vec_id") < ArrivalBound)
        val tmp = landing.resolve("_tmp")
        (0 until nBuckets).foreach { i =>
          val lo = ArrivalBound * i / nBuckets
          val hi = ArrivalBound * (i + 1) / nBuckets
          raw.where(col("vec_id") >= lo && col("vec_id") < hi)
            .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val part = Using.resource(Files.list(tmp)) { st =>
            st.iterator().asScala
              .find(_.getFileName.toString.endsWith(".parquet"))
              .getOrElse(sys.error(s"vec bucket $i produced no parquet part"))
          }
          val dst = landing.resolve(f"vecs-$i%03d.parquet")
          Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
          Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(1_000_000_000_000L + i * 60_000L))
        }
        DocStreams.deleteTree(tmp)
        Files.write(marker, sig.getBytes("UTF-8"))
      }
    }
    s.readStream
      .schema(embSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landing.toString)
  }

  /** One micro-batch fold: assign the batch under the FROZEN trained
    * centroids, write to its own overwrite dir — exposed so the
    * restart spec can replay a duplicate id directly. */
  private[graft] def e2fFoldBatch(df: DataFrame, id: Long,
      cents: Seq[(Int, Seq[Double])], work: java.nio.file.Path): Unit =
    df.select(col("vec_id"), col("label"), col("embedding"),
        SimOps.bestCentroid(col("embedding").cast("array<double>"), cents)
          .getField("cid").as("cell"))
      .write.mode("overwrite")
      .parquet(work.resolve(s"folds/batch=$id").toString)

  private[graft] def e2fDrain(s: SparkSession, d: String,
      work: java.nio.file.Path): Unit =
    StreamTune.withDrainWidthFrom(s,
      java.nio.file.Paths.get(d, "embeddings.parquet")) { e2fDrainBody(s, d, work) }

  private def e2fDrainBody(s: SparkSession, d: String,
      work: java.nio.file.Path): Unit = {
    val cents = IvfServe.centroidsAt(s, foldBaseDir(d))
    val foldRoot = work.resolve("folds")
    val q = vecStreamBucketed(s, d, nBuckets = 4)
      .writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        // concatenation as the re-merge: fold rows are a vec_id-keyed
        // set, so compaction relocates and never re-aggregates. Covered
        // dirs a retained snapshot manifest still references are SPARED
        // from cleanup, and every batch stamps a manifest of the live
        // read set (r13 ask #5 — the e72 discipline on the VECTOR
        // folds): "probe the index as of batch k" stays answerable
        // after compaction for the retention window, which is the
        // reproducibility a training run needs when its eval set was
        // retrieved at a pinned index version.
        EventStreams.maybeCompactFolds(s, foldRoot, id, df => df,
          spare = SnapshotFolds.retainedRefs(foldRoot))
        e2fFoldBatch(df, id, cents, work)
        SnapshotFolds.writeManifest(foldRoot, id)
      }
      .option("checkpointLocation", work.resolve("ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      StreamBusy.addQuery(q)
    } finally q.stop()
  }

  /** The probe's scored candidate relation (pre-top-k) — exposed so
    * E2fStreamSpec can assert ARRIVAL VISIBILITY exactly: a folded
    * vector sharing a query's cell must appear here after its batch
    * lands (and not before), even when it misses the top-3. */
  private[graft] def e2fCandidates(s: SparkSession, d: String,
      work: java.nio.file.Path): DataFrame =
    candidatesAt(s, foldBaseDir(d), Some(work.resolve("folds")), d)

  /** The same probe against ANY trained layout root (queries routed
    * under THAT root's centroids) with optional fold dirs — the
    * re-stage spec probes the rebuilt index through this. */
  private[graft] def candidatesAt(s: SparkSession, root: String,
      foldRootOpt: Option[java.nio.file.Path], d: String): DataFrame = {
    val (q, cells) = routedQueriesAt(s, root, d)
    scoredAgainst(s, root, foldRootOpt, q, cells)
  }

  /** The nprobe-1 query routing under `root`'s centroids — ONE
    * definition for the live probe and the snapshot probe (a routing
    * change applied to one but not the other would silently diverge
    * the pinned read from the current one). */
  private def routedQueriesAt(s: SparkSession, root: String,
      d: String): (DataFrame, Seq[Int]) = {
    val cents = IvfServe.centroidsAt(s, root)
    val q = graft.Tables.embeddings(s, d).where(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"),
        col("embedding").cast("array<double>").as("qv"))
      .withColumn("cell",
        SimOps.bestCentroid(col("qv"), cents).getField("cid"))
    val cells = q.select("cell").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    (q, cells)
  }

  /** Multi-probe variant (the e2w knob against an arbitrary root) —
    * queries routed driver-side to their `nprobe` nearest cells; the
    * re-stage spec measures that a REBALANCED index serves the same
    * recall through its probe knob while reading fewer candidates
    * than one drift-fattened frozen cell. */
  private[graft] def multiprobeCandidatesAt(s: SparkSession, root: String,
      foldRootOpt: Option[java.nio.file.Path], d: String, nprobe: Int): DataFrame = {
    val foldDirsIn = foldRootOpt.toSeq.flatMap { foldRoot =>
      if (java.nio.file.Files.isDirectory(foldRoot))
        EventStreams.foldDirsToRead(foldRoot)
      else Seq.empty[String]
    }
    multiprobeCandidatesWithDirs(s, root, foldDirsIn, d, nprobe)
  }

  /** The multiprobe scored relation against an EXPLICIT fold-dir list
    * and a declared query-id bound — e71v probes the pinned manifest
    * set through this with queries vec_id < NQueries. */
  private[graft] def multiprobeCandidatesWithDirs(s: SparkSession, root: String,
      foldDirsIn: Seq[String], d: String, nprobe: Int,
      qMax: Long = 8L): DataFrame = {
    import s.implicits._
    val cents = IvfServe.centroidsAt(s, root).map { case (c, v) => (c, v.toArray) }
    val qRows = graft.Tables.embeddings(s, d).where(col("vec_id") < qMax)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val routed = qRows.toSeq.flatMap { case (qid, qv) =>
      IvfServe.nearestCells(qv, cents, nprobe).map(c => (qid, qv.toSeq, c)) }
    val q = routed.toDF("q_id", "qv", "cell")
    scoredWithDirs(s, root, foldDirsIn, q, routed.map(_._3).distinct.sorted)
  }

  private def scoredAgainst(s: SparkSession, root: String,
      foldRootOpt: Option[java.nio.file.Path], q: DataFrame,
      cells: Seq[Int]): DataFrame = {
    // a probe BEFORE the first arrival batch: base-only (the dir does
    // not exist yet — the e63sResult empty-delta convention)
    val foldDirs = foldRootOpt.toSeq.flatMap { foldRoot =>
      if (java.nio.file.Files.isDirectory(foldRoot))
        EventStreams.foldDirsToRead(foldRoot)
      else Seq.empty[String]
    }
    scoredWithDirs(s, root, foldDirs, q, cells)
  }

  /** The probe's scored relation against an EXPLICIT fold-dir list —
    * the current read set ([[scoredAgainst]]) or a snapshot manifest's
    * pinned set ([[e2zFoldSnapshot]]). */
  private def scoredWithDirs(s: SparkSession, root: String,
      foldDirs: Seq[String], q: DataFrame, cells: Seq[Int]): DataFrame = {
    val cols = Seq("vec_id", "label", "embedding", "cell").map(col)
    val base = s.read.parquet(s"$root/lists")
      .where(col("cell").isin(cells.map(Int.box): _*)).select(cols: _*)
    val all =
      if (foldDirs.isEmpty) base
      else base.unionByName(
        s.read.parquet(foldDirs: _*)
          .where(col("cell").isin(cells.map(Int.box): _*)).select(cols: _*))
    all
      .select(col("vec_id").as("cand_id"), col("cell"),
        col("embedding").cast("array<double>").as("v"))
      .join(broadcast(q), Seq("cell"))
      .where(col("cand_id") =!= col("q_id"))
      .select(col("q_id"), col("cand_id"),
        round(graft.functions.GraftFunctions.cosine(col("qv"), col("v")), 6)
          .as("cos_sim"))
  }

  /** The probe over base + folds: query cells under the frozen
    * centroids, base lists partition-pruned, folds cell-filtered. */
  private[graft] def e2fProbe(s: SparkSession, d: String,
      work: java.nio.file.Path): DataFrame =
    SimOps.topK(e2fCandidates(s, d, work), 3)

  /** E2f: the declared fold-stream key — fresh drain per invocation
    * (the e6s stance), then the probe; oracle = the full trained-serve
    * replay with the base/arrival split (see ivfServeOracleSql). */
  def e2fIvfFoldStream(s: SparkSession, dir: String): DataFrame = {
    ensureFoldBase(s, dir)
    val work = java.nio.file.Paths.get(
      sys.env.getOrElse("GRAFT_FIXTURE_DIR", "/root/repo/target/fixtures"),
      "stream-e2f", graft.util.PathKeys.keyedName(dir) + "-4")
    DocStreams.deleteTree(work)
    e2fDrain(s, dir, work)
    e2fProbe(s, dir, work)
  }

  /** Occupancy-drift bar for [[e2gDriftGate]]: re-stage when some
    * cell's arrival share diverges from its base share by more than
    * this. 1/16-granular arrival shares on iid fixtures measure ≤ 0.1
    * (sf0.01: 0.096, sf0.1: 0.051); a one-cell drift cluster measures
    * ~1 − base_share ≈ 0.98 — the bar sits in the dead middle. */
  val DriftBar = 0.5

  /** E2g: the QUANTIZER-LIFECYCLE drift gate (r12 verdict ask #2) —
    * [[e2fIvfFoldStream]] freezes the trained quantizer forever, which
    * is the right per-insert contract, but a production IVF index
    * RETRAINS ON A CADENCE when arrivals drift: an ever-fattening cell
    * ruins probe cost (answers stay exact — in-cell rescore — so the
    * failure is COST, which is exactly what occupancy skew sees).
    *
    * The declared key drains the arrival stream fresh (the e2f
    * protocol, its own work dir), folds arrivals under the frozen
    * quantizer, and emits the per-cell occupancy comparison: for every
    * cell with arrivals — base count/share, arrival count/share, the
    * |arr − base| share drift, the corpus-wide max drift, and the gate
    * verdict. [[maybeRestage]] then applies the lifecycle contract:
    * rebuild the trained layout over base+arrivals when the gate
    * trips (a no-op on the iid fixture — VecDriftSpec plants a real
    * drift cluster, trips it, and measures that the rebuild
    * redistributes the mass and shrinks the drifted probe while recall
    * holds).
    *
    * The DuckDB oracle replays the whole base-trained chain and both
    * occupancy sides from the same assignment, so a mis-assigned,
    * dropped, or double-counted arrival is a hash miss.
    *
    * 100 TB path: both occupancy sides are metadata-sized aggregates
    * (≤ k rows out of partial counts — the lists' footers could even
    * answer the base side); the gate decision reads k rows; the
    * rebuild, when it fires, costs what the build cost — the point of
    * the gate is paying it on MEASURED drift instead of on a timer. */
  def e2gDriftGate(s: SparkSession, dir: String): DataFrame = {
    ensureFoldBase(s, dir)
    val work = java.nio.file.Paths.get(
      sys.env.getOrElse("GRAFT_FIXTURE_DIR", "/root/repo/target/fixtures"),
      "stream-e2g", graft.util.PathKeys.keyedName(dir) + "-4")
    DocStreams.deleteTree(work)
    e2fDrain(s, dir, work)
    maybeRestage(s, dir, work) // the lifecycle contract; no-op unless tripped
    driftReport(s, dir, work)
  }

  /** Per-cell occupancy drift of the folded arrivals vs the trained
    * base — the declared e2g relation (cells with arrivals, ordered). */
  private[graft] def driftReport(s: SparkSession, d: String,
      work: java.nio.file.Path): DataFrame = {
    val root = foldBaseDir(d)
    val base = s.read.parquet(s"$root/lists")
      .groupBy("cell").agg(count(lit(1)).as("n_base"))
    val foldRoot = work.resolve("folds")
    val foldDirs =
      if (java.nio.file.Files.isDirectory(foldRoot))
        EventStreams.foldDirsToRead(foldRoot)
      else Seq.empty[String]
    require(foldDirs.nonEmpty, s"drift gate needs folded arrivals under $foldRoot")
    val arr = s.read.parquet(foldDirs: _*)
      .groupBy("cell").agg(count(lit(1)).as("n_arr"))
    val cells = base.join(arr, Seq("cell"), "full_outer")
      .select(col("cell"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_arr"), lit(0L)).as("n_arr"))
    // k-row relation from here on: the scalar attaches are broadcast
    // 1-row aggregates (the suite convention)
    val tot = cells.agg(sum("n_base").as("tb"), sum("n_arr").as("ta"))
    val sh = cells.crossJoin(broadcast(tot))
      .withColumn("base_share", round(col("n_base") / col("tb").cast("double"), 6))
      .withColumn("arr_share", round(col("n_arr") / col("ta").cast("double"), 6))
      .withColumn("share_drift", round(abs(col("arr_share") - col("base_share")), 6))
    val mx = sh.agg(max(col("share_drift")).as("max_drift"))
    sh.crossJoin(broadcast(mx))
      .withColumn("gate_tripped", col("max_drift") > DriftBar)
      .where(col("n_arr") > 0)
      .select("cell", "n_base", "n_arr", "base_share", "arr_share",
        "share_drift", "max_drift", "gate_tripped")
      .orderBy("cell")
  }

  /** The re-stage decision: read the gate, rebuild when tripped.
    * Returns the restaged root when a rebuild happened. */
  private[graft] def maybeRestage(s: SparkSession, d: String,
      work: java.nio.file.Path): Option[java.nio.file.Path] = {
    val md = driftReport(s, d, work)
      .agg(max(col("max_drift"))).head().getDouble(0)
    if (md > DriftBar) Some(restageWithArrivals(s, d, work)) else None
  }

  /** The declared read-back snapshot for [[e2zFoldSnapshot]]: batch 2
    * of the 4-bucket drain — a PAST index version (batch 3 lands after
    * it AND its step compacts batches 0..2 away from the current read
    * set), so the declared rows prove the pinned probe survives both a
    * later write and a later compaction. */
  val DeclaredVecSnap = 2L

  /** E2z: PROBE-AT-SNAPSHOT over the manifested vector folds (r13
    * verdict ask #5 — e72's read-at-version, on the ANN index). Drains
    * the arrival stream fresh (the e2f protocol; every batch stamps a
    * manifest, compaction spares manifest-referenced dirs), then probes
    * base + the folds AS OF [[DeclaredVecSnap]] — arrivals of batches
    * 0..2 (vec_id < 12) visible, batch 3's (vec_id 12..15) NOT, even
    * though the current layout has folded and compacted past them.
    * This is the reproducibility contract a training run needs when
    * its eval set was retrieved at a pinned index version. Oracle: the
    * trained-serve replay with the candidate corpus restricted to
    * base ∪ the batch prefix ≤ 2 — a snapshot that leaked a later
    * arrival (or lost a pinned one) is a hash miss. Spec
    * (E2fStreamSpec) pins prefix-fold equality against a one-shot
    * replay, survival under the batch-3 compaction, and loud expiry.
    *
    * 100 TB path: the manifest is O(live dirs) metadata; the pinned
    * probe costs exactly the e2f probe (base partition-pruned, ≤
    * Retain fold dirs cell-filtered); spared-dir storage is bounded by
    * the retention window, never history. */
  def e2zFoldSnapshot(s: SparkSession, dir: String): DataFrame = {
    ensureFoldBase(s, dir)
    val work = java.nio.file.Paths.get(
      sys.env.getOrElse("GRAFT_FIXTURE_DIR", "/root/repo/target/fixtures"),
      "stream-e2z", graft.util.PathKeys.keyedName(dir) + "-4")
    DocStreams.deleteTree(work)
    e2fDrain(s, dir, work)
    SimOps.topK(candidatesAtSnapshot(s, dir, work, DeclaredVecSnap), 3)
      .withColumn("snapshot_id", lit(DeclaredVecSnap))
  }

  /** The e2f probe against the fold dirs a RETAINED manifest pinned,
    * instead of the current read set. */
  private[graft] def candidatesAtSnapshot(s: SparkSession, d: String,
      work: java.nio.file.Path, snap: Long): DataFrame = {
    val root = foldBaseDir(d)
    val (q, cells) = routedQueriesAt(s, root, d)
    val foldRoot = work.resolve("folds")
    val dirs = SnapshotFolds.readManifest(foldRoot, snap)
      .map(n => foldRoot.resolve(n).toString)
    scoredWithDirs(s, root, dirs, q, cells)
  }

  /** The rebuild leg: retrain the full layout (coarse quantizer AND
    * PQ books) over base + arrivals — the e57/e63 refresh discipline
    * applied to the index itself. The frozen-quantizer fold protocol
    * resumes from the new layout; every already-written base list is
    * superseded, never edited in place. */
  private[graft] def restageWithArrivals(s: SparkSession, d: String,
      work: java.nio.file.Path): java.nio.file.Path = {
    val dst = work.resolve("restaged")
    DocStreams.deleteTree(dst)
    IvfServe.buildTrainedLayout(s, dst.toString, IvfServe.corpusView(s, d))
    dst
  }

  // ───────────────────────── tombstone deletes (e2d) ──────────────────

  /** Declared tombstone set for [[e2dVecTombstone]] — the text side's
    * [[LexStreams.TombMod]] declaration on vec_id, straddling the
    * arrival bound: vectors 3 and 10 arrive then delete, 17/24/31/38/45
    * delete out of the trained base lists. Vector 3 is ALSO a declared
    * query (vec_id < 8): a deleted vector can still QUERY — the request
    * side owns the query vector — it just can never be a candidate. */
  private[graft] def vecTombPred(id: org.apache.spark.sql.Column) =
    id % LexStreams.TombMod === LexStreams.TombRes && id < LexStreams.TombBound

  /** Landing of the CDC vector stream — shared by the stager and the
    * drain's bounded-batch guard. */
  private[graft] def vecCdcLanding(dir: String): java.nio.file.Path =
    java.nio.file.Paths.get(
      sys.env.getOrElse("GRAFT_FIXTURE_DIR", "/root/repo/target/fixtures"),
      "stream-vecs-cdc", graft.util.PathKeys.keyedName(dir) + "-4")

  /** CDC staging: the 4 arrival buckets plus 2 DELETE buckets (key
    * present, embedding NULL — the CDC delete record), split by
    * vec_id < 24 / ≥ 24 so deletes land as batches 4 and 5 and a
    * snapshot can pin between them. */
  private[graft] def cdcVecStream(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    import scala.util.Using
    val nArr = 4
    val src = Paths.get(dir, "embeddings.parquet")
    val landing = vecCdcLanding(dir)
    synchronized {
      val marker = landing.resolve("_STAGED")
      val sig = s"c1:${Files.size(src)}:${Files.getLastModifiedTime(src).toMillis}"
      val nFiles = nArr + 2
      val filesPresent = (0 until nFiles)
        .forall(i => Files.exists(landing.resolve(f"cdc-$i%03d.parquet")))
      val stale = !Files.exists(marker) || !filesPresent ||
        new String(Files.readAllBytes(marker), "UTF-8") != sig
      if (stale) {
        if (Files.exists(landing)) DocStreams.deleteTree(landing)
        Files.createDirectories(landing)
        val raw = s.read.schema(embSchema).parquet(src.toString)
        val tmp = landing.resolve("_tmp")
        def stage(i: Int, rows: DataFrame): Unit = {
          rows.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val part = Using.resource(Files.list(tmp)) { st =>
            st.iterator().asScala
              .find(_.getFileName.toString.endsWith(".parquet"))
              .getOrElse(sys.error(s"vec cdc bucket $i produced no parquet part"))
          }
          val dst = landing.resolve(f"cdc-$i%03d.parquet")
          Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
          Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(1_000_000_000_000L + i * 60_000L))
        }
        (0 until nArr).foreach { i =>
          val lo = ArrivalBound * i / nArr
          val hi = ArrivalBound * (i + 1) / nArr
          stage(i, raw.where(col("vec_id") >= lo && col("vec_id") < hi))
        }
        val dels = raw.where(vecTombPred(col("vec_id")))
          .select(col("vec_id"),
            lit(null).cast("array<float>").as("embedding"),
            lit(null).cast("int").as("label"))
        stage(nArr, dels.where(col("vec_id") < 24))
        stage(nArr + 1, dels.where(col("vec_id") >= 24))
        DocStreams.deleteTree(tmp)
        Files.write(marker, sig.getBytes("UTF-8"))
      }
    }
    s.readStream
      .schema(embSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landing.toString)
  }

  /** One CDC micro-batch fold: upserts assign under the frozen
    * quantizer ([[e2fFoldBatch]]); delete records land as a tombstone
    * fold `(vec_id, upto=batchId)` — no payload to resolve (an ANN
    * index has no per-doc statistics to roll back, unlike BM25's dl).
    * The batch-bounded `upto` is Lucene's delete semantics: a delete
    * kills versions OLDER than it, so a re-added key lives again
    * (pre-upto trees normalize to +∞ at read). Empty sides write
    * nothing — deterministic under replay. */
  private[graft] def cdcVecFoldBatch(df: DataFrame, id: Long,
      cents: Seq[(Int, Seq[Double])], work: java.nio.file.Path,
      bounded: Boolean = true): Unit = {
    if (bounded) {
      // ONE bounded collect classifies the batch (r15 optimization
      // round; was two isEmpty probes — two extra jobs per micro-batch,
      // one of which re-ran the delete projection for the write): CDC
      // keys are bounded by declaration (enforced by the landing-bytes
      // guard since r16) and only (vec_id, tombstone?) crosses the
      // driver, never the embedding payload.
      val keyed = df.select(col("vec_id"), col("embedding").isNull.as("del"))
        .collect().map(r => (r.getLong(0), r.getBoolean(1)))
      if (keyed.exists(!_._2))
        e2fFoldBatch(df.where(col("embedding").isNotNull), id, cents, work)
      val delIds = keyed.collect { case (v, true) => v }.sorted
      if (delIds.nonEmpty) {
        val s = df.sparkSession
        import s.implicits._
        delIds.toSeq.map((_, id)).toDF("vec_id", "upto")
          .coalesce(1).write.mode("overwrite")
          .parquet(work.resolve(s"tombs/batch=$id").toString)
      }
    } else {
      // DISTRIBUTED FALLBACK (r15 verdict ask #5): no driver collect —
      // isEmpty classification probes and a distributed tombstone write
      // (the pre-r15 shape: two extra jobs per trigger, paid only on
      // batches too large to collect). Row-identical to the bounded
      // path (spec-pinned).
      val ups = df.where(col("embedding").isNotNull)
      if (!ups.isEmpty) e2fFoldBatch(ups, id, cents, work)
      val dels = df.where(col("embedding").isNull)
        .select(col("vec_id"), lit(id).as("upto"))
      if (!dels.isEmpty)
        dels.coalesce(1).write.mode("overwrite")
          .parquet(work.resolve(s"tombs/batch=$id").toString)
    }
  }

  private[graft] def cdcVecDrain(s: SparkSession, d: String,
      work: java.nio.file.Path): Unit =
    StreamTune.withDrainWidthFrom(s,
      java.nio.file.Paths.get(d, "embeddings.parquet")) { cdcVecDrainBody(s, d, work) }

  private def cdcVecDrainBody(s: SparkSession, d: String,
      work: java.nio.file.Path): Unit = {
    val cents = IvfServe.centroidsAt(s, foldBaseDir(d))
    val trees = Seq("folds", "tombs").map(work.resolve)
    trees.foreach(java.nio.file.Files.createDirectories(_))
    val bounded = LexStreams.boundedLanding(vecCdcLanding(d))
    val q = cdcVecStream(s, d)
      .writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        trees.foreach { t =>
          EventStreams.maybeCompactFolds(s, t, id, df => df,
            spare = SnapshotFolds.retainedRefs(t))
        }
        cdcVecFoldBatch(df, id, cents, work, bounded)
        trees.foreach(SnapshotFolds.writeManifest(_, id))
      }
      .option("checkpointLocation", work.resolve("ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      StreamBusy.addQuery(q)
    } finally q.stop()
  }

  /** The live-docs candidate relation: the e2f probe's scored rows
    * anti-joined against the broadcast tombstone set (deduped by
    * vec_id at read — a vector deleted in two batches drops once).
    * Exposed with explicit dir lists so the pinned-snapshot probe and
    * the spec share one definition. */
  private[graft] def tombCandidatesWithDirs(s: SparkSession, d: String,
      foldDirsIn: Seq[String], tombDirs: Seq[String]): DataFrame =
    // a DELETE is an upsert without a co-shipped new version: the
    // version-less delete trees normalize to ver 0 / upto +∞ inside
    // the shared version-aware relation (the LexStreams discipline)
    upsertCandidatesWithDirs(s, d, foldDirsIn, tombDirs)

  private def treeDirs(work: java.nio.file.Path, tree: String): Seq[String] = {
    val t = work.resolve(tree)
    if (java.nio.file.Files.isDirectory(t)) EventStreams.foldDirsToRead(t)
    else Seq.empty[String]
  }

  /** The tombstone probe AT a pinned snapshot: BOTH trees resolve
    * through their manifests — a vector deleted at batch k stays a
    * candidate at snapshots < k. Same pinning as the upsert
    * lifecycle's (one definition — the relation normalizes the
    * version-less delete trees itself). */
  private[graft] def tombCandidatesAtSnapshot(s: SparkSession, d: String,
      work: java.nio.file.Path, snap: Long): DataFrame =
    upsertCandidatesAtSnapshot(s, d, work, snap)

  /** Restage RECONCILIATION: retrain the full layout over (base ∪
    * arrivals) − tombstones — deleted vectors physically absent from
    * the rebuilt lists, the e2g restage discipline carrying the
    * live-docs set. */
  private[graft] def restageLive(s: SparkSession, d: String,
      work: java.nio.file.Path): java.nio.file.Path = {
    val tombDirs = treeDirs(work, "tombs")
    val tombIds =
      if (tombDirs.isEmpty) Array.empty[Long]
      else s.read.parquet(tombDirs: _*).select("vec_id").distinct()
        .collect().map(_.getLong(0)).sorted
    val dst = work.resolve("restaged")
    DocStreams.deleteTree(dst)
    val corpus = IvfServe.corpusView(s, d)
    IvfServe.buildTrainedLayout(s, dst.toString,
      if (tombIds.isEmpty) corpus
      else corpus.where(!col("vec_id").isin(tombIds.map(Long.box): _*)))
    dst
  }

  /** E2d: TOMBSTONE DELETES in the vector-index lifecycle (r15 verdict
    * ask #1, vector half). The CDC drain replays the 4 arrival batches
    * then 2 DELETE batches; each delete lands as a live-docs tombstone
    * fold `(vec_id)` beside the vector folds, honored at probe (one
    * broadcast anti-join against the bounded set — the Lucene live-docs
    * bitmap as a relation), RECONCILED at restage ([[restageLive]],
    * spec-pinned physical absence), and PINNED by the snapshot
    * manifests (deleted at batch k ⇒ still a candidate at snapshots
    * < k — spec-pinned). The quantizer stays frozen: deletes change
    * CANDIDACY, never the trained model, exactly as production IVF
    * (FAISS remove_ids leaves the coarse centroids untouched).
    *
    * Oracle: the trained-serve replay with candidates restricted to
    * corpus − tombstones — a probe that served a deleted vector (or
    * dropped a live one) is a hash miss.
    *
    * 100 TB path: a tombstone fold is O(batch deletes) rows; the probe
    * adds one broadcast anti-join; the base lists rewrite only at the
    * restage the lifecycle was already paying. */
  def e2dVecTombstone(s: SparkSession, dir: String): DataFrame = {
    ensureFoldBase(s, dir)
    val work = java.nio.file.Paths.get(
      sys.env.getOrElse("GRAFT_FIXTURE_DIR", "/root/repo/target/fixtures"),
      "stream-e2d", graft.util.PathKeys.keyedName(dir) + "-4")
    DocStreams.deleteTree(work)
    cdcVecDrain(s, dir, work)
    SimOps.topK(tombCandidatesWithDirs(s, dir,
      treeDirs(work, "folds"), treeDirs(work, "tombs")), 3)
  }

  // ───────────────────────── upserts (e2u) ────────────────────────────

  /** Declared UPDATE set for [[e2uVecUpsert]] — the text side's
    * [[LexStreams.updPred]] on vec_id: vectors 9 and 13 re-arrive over
    * their own folds, 17/21/25/29/33 over the trained base lists. No
    * update id is a query id (queries are vec_id < 8): the request
    * side owns its query vector, so the declared queries stay the
    * original embeddings — an update changes CANDIDACY, never the
    * probe's requests. */
  private[graft] def vecUpdPred(id: org.apache.spark.sql.Column) =
    LexStreams.updPred(id)

  /** The updated payload: the embedding NEGATED — exactly expressible
    * in SQL (`list_transform(v, x -> -x)`, IEEE-exact in float and
    * double alike) and guaranteed to MOVE the vector in space, so a
    * probe serving a stale version ranks visibly wrong. */
  private[graft] def updatedVec(v: org.apache.spark.sql.Column) =
    transform(v, x => -x)

  /** CDC-U staging: the 4 arrival buckets (original embeddings) plus
    * 2 UPDATE buckets re-arriving the declared set with the NEW
    * payload, split by vec_id < 24 / ≥ 24 (batches 4 and 5) so a
    * snapshot can pin between them. */
  private[graft] def cdcUpsertVecStream(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    import scala.util.Using
    val nArr = 4
    val src = Paths.get(dir, "embeddings.parquet")
    val landing = Paths.get(
      sys.env.getOrElse("GRAFT_FIXTURE_DIR", "/root/repo/target/fixtures"),
      "stream-vecs-upsert", graft.util.PathKeys.keyedName(dir) + s"-$nArr")
    synchronized {
      val marker = landing.resolve("_STAGED")
      val sig = s"u1:${Files.size(src)}:${Files.getLastModifiedTime(src).toMillis}"
      val nFiles = nArr + 2
      val filesPresent = (0 until nFiles)
        .forall(i => Files.exists(landing.resolve(f"upd-$i%03d.parquet")))
      val stale = !Files.exists(marker) || !filesPresent ||
        new String(Files.readAllBytes(marker), "UTF-8") != sig
      if (stale) {
        if (Files.exists(landing)) DocStreams.deleteTree(landing)
        Files.createDirectories(landing)
        val raw = s.read.schema(embSchema).parquet(src.toString)
        val tmp = landing.resolve("_tmp")
        def stage(i: Int, rows: DataFrame): Unit = {
          rows.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val part = Using.resource(Files.list(tmp)) { st =>
            st.iterator().asScala
              .find(_.getFileName.toString.endsWith(".parquet"))
              .getOrElse(sys.error(s"vec upsert bucket $i produced no parquet part"))
          }
          val dst = landing.resolve(f"upd-$i%03d.parquet")
          Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
          Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(1_000_000_000_000L + i * 60_000L))
        }
        (0 until nArr).foreach { i =>
          val lo = ArrivalBound * i / nArr
          val hi = ArrivalBound * (i + 1) / nArr
          stage(i, raw.where(col("vec_id") >= lo && col("vec_id") < hi))
        }
        val upds = raw.where(vecUpdPred(col("vec_id")))
          .withColumn("embedding", updatedVec(col("embedding")))
        stage(nArr, upds.where(col("vec_id") < 24))
        stage(nArr + 1, upds.where(col("vec_id") >= 24))
        DocStreams.deleteTree(tmp)
        Files.write(marker, sig.getBytes("UTF-8"))
      }
    }
    s.readStream
      .schema(embSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landing.toString)
  }

  /** One UPSERT micro-batch fold — updateDocument on the ANN index:
    * every incoming key tombstones UNCONDITIONALLY as `(vec_id,
    * upto=batch)` (Lucene buffers delete terms without checking
    * existence; a first-time arrival's tombstone kills nothing — the
    * anti-join `ver < upto` only ever retires rows that exist), and
    * the new version assigns under the FROZEN quantizer, stamped
    * `ver = batch` (base lists read as ver −1). Unlike the text side,
    * no prior lookup is needed at all: an ANN tombstone carries no
    * per-doc statistics to roll back (BM25's dl has no analogue). */
  private[graft] def upsertVecFoldBatch(df: DataFrame, id: Long,
      cents: Seq[(Int, Seq[Double])], work: java.nio.file.Path): Unit = {
    df.select(col("vec_id"), lit(id).as("upto"))
      .write.mode("overwrite")
      .parquet(work.resolve(s"tombs/batch=$id").toString)
    df.select(col("vec_id"), col("label"), col("embedding"),
        SimOps.bestCentroid(col("embedding").cast("array<double>"), cents)
          .getField("cid").as("cell"), lit(id).as("ver"))
      .write.mode("overwrite")
      .parquet(work.resolve(s"folds/batch=$id").toString)
  }

  private[graft] def upsertVecDrain(s: SparkSession, d: String,
      work: java.nio.file.Path): Unit =
    StreamTune.withDrainWidthFrom(s,
      java.nio.file.Paths.get(d, "embeddings.parquet")) {
      upsertVecDrainBody(s, d, work)
    }

  private def upsertVecDrainBody(s: SparkSession, d: String,
      work: java.nio.file.Path): Unit = {
    val cents = IvfServe.centroidsAt(s, foldBaseDir(d))
    val trees = Seq("folds", "tombs").map(work.resolve)
    trees.foreach(java.nio.file.Files.createDirectories(_))
    val q = cdcUpsertVecStream(s, d)
      .writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        trees.foreach { t =>
          EventStreams.maybeCompactFolds(s, t, id, df => df,
            spare = SnapshotFolds.retainedRefs(t))
        }
        upsertVecFoldBatch(df, id, cents, work)
        trees.foreach(SnapshotFolds.writeManifest(_, id))
      }
      .option("checkpointLocation", work.resolve("ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      StreamBusy.addQuery(q)
    } finally q.stop()
  }

  /** The read-side normalization that lets ONE relation serve both the
    * delete and the upsert lifecycle (the LexStreams discipline): fold
    * trees written without `ver` read as ver 0; tombstones without
    * `upto` read as +∞ (a delete kills every version of its key). */
  private def versionedFolds(s: SparkSession, dirs: Seq[String]): DataFrame = {
    val raw = s.read.parquet(dirs: _*)
    if (raw.columns.contains("ver")) raw
    else raw.withColumn("ver", lit(0L))
  }

  private def versionedTombs(s: SparkSession, dirs: Seq[String]): DataFrame = {
    val raw = s.read.parquet(dirs: _*)
    if (raw.columns.contains("upto")) raw
    else raw.withColumn("upto", lit(Long.MaxValue))
  }

  /** The VERSION-AWARE scored relation: candidates = (base lists at
    * ver −1 ∪ folds) anti-joined against the broadcast tombstones on
    * `vec_id match AND ver < upto` — a superseded version dies, the
    * version shipped with the tombstone's own batch survives. Queries
    * route under the frozen centroids from the ORIGINAL embeddings
    * (the request owns its vector — the e2d stance). */
  private[graft] def upsertCandidatesWithDirs(s: SparkSession, d: String,
      foldDirsIn: Seq[String], tombDirs: Seq[String]): DataFrame = {
    import s.implicits._
    val root = foldBaseDir(d)
    val (q, cells) = routedQueriesAt(s, root, d)
    val cols = Seq("vec_id", "label", "embedding", "cell", "ver").map(col)
    val base = s.read.parquet(s"$root/lists")
      .where(col("cell").isin(cells.map(Int.box): _*))
      .withColumn("ver", lit(-1L)).select(cols: _*)
    val all =
      if (foldDirsIn.isEmpty) base
      else base.unionByName(
        versionedFolds(s, foldDirsIn)
          .where(col("cell").isin(cells.map(Int.box): _*)).select(cols: _*))
    val tombs = (if (tombDirs.isEmpty)
        Seq.empty[(Long, Long)].toDF("vec_id", "upto")
      else versionedTombs(s, tombDirs).select("vec_id", "upto")).distinct()
    val t = tombs.select(col("vec_id").as("t_vec"), col("upto"))
    val live = all.join(broadcast(t),
      all("vec_id") === t("t_vec") && all("ver") < t("upto"), "left_anti")
    live
      .select(col("vec_id").as("cand_id"), col("cell"),
        col("embedding").cast("array<double>").as("v"))
      .join(broadcast(q), Seq("cell"))
      .where(col("cand_id") =!= col("q_id"))
      .select(col("q_id"), col("cand_id"),
        round(graft.functions.GraftFunctions.cosine(col("qv"), col("v")), 6)
          .as("cos_sim"))
  }

  /** The version-aware probe AT a pinned snapshot: both trees resolve
    * through their `snap` manifests — a vector updated at batch k
    * still serves its OLD version at snapshots < k. */
  private[graft] def upsertCandidatesAtSnapshot(s: SparkSession, d: String,
      work: java.nio.file.Path, snap: Long): DataFrame = {
    def pinned(tree: String) = {
      val t = work.resolve(tree)
      SnapshotFolds.readManifest(t, snap).map(n => t.resolve(n).toString)
    }
    upsertCandidatesWithDirs(s, d, pinned("folds"), pinned("tombs"))
  }

  /** Restage reconciliation FROM THE INDEX ITSELF: the updated
    * embeddings exist only in the stream (the source table still
    * carries the originals), so the upsert restage retrains the full
    * layout over the LIVE INDEX ROWS — (base lists ∪ folds) with
    * superseded versions anti-joined out — rather than re-reading any
    * corpus. Superseded storage is reclaimed here, exactly the Lucene
    * merge. */
  private[graft] def restageFromIndex(s: SparkSession, d: String,
      work: java.nio.file.Path): java.nio.file.Path = {
    import s.implicits._
    val root = foldBaseDir(d)
    val foldDirsIn = treeDirs(work, "folds")
    val tombDirs = treeDirs(work, "tombs")
    val base = s.read.parquet(s"$root/lists")
      .select(col("vec_id"), col("label"), col("embedding"))
      .withColumn("ver", lit(-1L))
    val all = if (foldDirsIn.isEmpty) base
      else base.unionByName(s.read.parquet(foldDirsIn: _*)
        .select("vec_id", "label", "embedding", "ver"))
    val tombs = (if (tombDirs.isEmpty)
        Seq.empty[(Long, Long)].toDF("vec_id", "upto")
      else s.read.parquet(tombDirs: _*)).distinct()
    val t = tombs.select(col("vec_id").as("t_vec"), col("upto"))
    val live = all.join(broadcast(t),
      all("vec_id") === t("t_vec") && all("ver") < t("upto"), "left_anti")
      .select(col("vec_id"), col("label"), col("embedding"),
        col("embedding").cast("array<double>").as("v"))
    val dst = work.resolve("restaged")
    DocStreams.deleteTree(dst)
    IvfServe.buildTrainedLayout(s, dst.toString, live)
    dst
  }

  /** E2u: UPSERTS in the vector-index lifecycle — the text side's
    * e35u verb on the ANN index: a changed vector RE-ARRIVES
    * (re-embedded document, model refresh backfill) and the index
    * must serve exactly one, latest version. Version-stamped folds
    * (base −1, folds their batch id), unconditional per-key
    * tombstones `(vec_id, upto=batch)`, the anti-join `ver < upto`
    * retiring old versions while the co-shipped new one survives; the
    * quantizer stays FROZEN — an update re-ROUTES the new version
    * under the trained centroids (possibly to a different cell), it
    * never retrains the model. The CDC-U drain replays 4 arrival
    * batches then 2 UPDATE batches re-arriving vectors 9/13 (over
    * their own folds) and 17/21/25/29/33 (over the trained base
    * lists) with embeddings NEGATED.
    *
    * Oracle: the trained-serve replay with candidates assigned from
    * the LATEST-VERSION corpus (the declared negation applied in SQL)
    * under centroids trained on the ORIGINAL base — a served stale
    * version, a dropped update, or an update routed by anything but
    * the frozen quantizer is a hash miss.
    *
    * 100 TB path: an upsert batch is one map-side assignment + two
    * bounded appends (no prior lookup at all — see
    * [[upsertVecFoldBatch]]); the probe adds one broadcast anti-join;
    * superseded storage is reclaimed at the restage the lifecycle was
    * already paying ([[restageFromIndex]], spec-pinned). */
  def e2uVecUpsert(s: SparkSession, dir: String): DataFrame = {
    ensureFoldBase(s, dir)
    val work = java.nio.file.Paths.get(
      sys.env.getOrElse("GRAFT_FIXTURE_DIR", "/root/repo/target/fixtures"),
      "stream-e2u", graft.util.PathKeys.keyedName(dir) + "-4")
    DocStreams.deleteTree(work)
    upsertVecDrain(s, dir, work)
    SimOps.topK(upsertCandidatesWithDirs(s, dir,
      treeDirs(work, "folds"), treeDirs(work, "tombs")), 3)
  }

  // ───────────────────────── tiered fold merge (e2tm) ─────────────────

  /** E2tm: the SIZE-TIERED FOLD MERGE on the vector index — e35t's
    * count-gated tier policy applied to the cell folds (the generic
    * [[EventStreams.tierMerge]]; fold rows are a vec_id-keyed set, so
    * concatenation is the re-merge and the probe's answer cannot
    * change — the declared rows are e2f's VERBATIM, oracle shared).
    * The tier merge collapses the post-drain read set (compact=2 +
    * batch=3) into ONE `compact=3` dir; the TRAINED BASE LISTS ARE
    * NEVER TOUCHED — the full retrain stays [[restageWithArrivals]]'s
    * job, gated on occupancy DRIFT by [[e2gDriftGate]]. Together the
    * two gates give the vector index the same two-tier lifecycle the
    * text index got in e35t/e35g: cheap intra-tier merges on COUNT,
    * the expensive retrain on measured DRIFT. The spec pins what the
    * row oracle cannot see: every base-list file's mtime untouched,
    * the read set collapsed to one dir, manifest-referenced dirs
    * spared so pinned snapshots keep resolving.
    *
    * 100 TB path: a tier merge costs O(live fold bytes) — orders of
    * magnitude under the retrain — and caps the probe's per-fold
    * overhead (listing + cell filter per dir) at O(TierFanout). */
  def e2tmVecTierMerge(s: SparkSession, dir: String): DataFrame = {
    ensureFoldBase(s, dir)
    val work = java.nio.file.Paths.get(
      sys.env.getOrElse("GRAFT_FIXTURE_DIR", "/root/repo/target/fixtures"),
      "stream-e2tm", graft.util.PathKeys.keyedName(dir) + "-4")
    DocStreams.deleteTree(work)
    e2fDrain(s, dir, work)
    EventStreams.maybeTierMerge(s, work.resolve("folds"))
    e2fProbe(s, dir, work)
  }
}
