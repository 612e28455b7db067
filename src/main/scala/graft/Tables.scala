package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver test tables (TESTDATA.md).
  *
  * All query entry points take the scale-factor directory at call time so
  * the same plan runs at sf0.001 (smoke), sf0.01 (DuckDB oracle) and sf0.1
  * (bench) — and, on a real cluster, at any path. Reads are plain
  * `spark.read.parquet` so Catalyst handles column pruning + filter
  * pushdown; nothing is cached or collected here.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  /** The events fixture has shipped `ts` three ways across driver
    * generations: TIMESTAMP(NANOS) (Spark 4 rejects it unless read as
    * nanos-since-epoch longs via `nanosAsLong`), BIGINT nanos (our
    * amplified copies), and plain µs TIMESTAMP / TIMESTAMP_NTZ. All
    * queries see one canonical TimestampType (µs); the session timezone
    * is pinned to UTC everywhere, so the NTZ→TZ cast is value-preserving. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(s, d, "events"))
  }

  /** Rewrite `ts` to TimestampType (µs) whatever the stored type was.
    * Long = nanos-since-epoch (µs-precision data, so the truncation is
    * lossless); NTZ casts 1:1 under the UTC session timezone. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _                => df
    }
  }

  /** Schema the events parquet at `path` actually carries, with
    * `nanosAsLong` pre-set so a TIMESTAMP(NANOS) column surfaces as
    * LongType — the schema a file-source stream must declare. */
  def eventsRawSchema(s: SparkSession, path: String): org.apache.spark.sql.types.StructType = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(path).schema
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Set by [[graft.Plans]] only: keeps declared results LAZY so plan
    * dumps show the full pipeline instead of the post-materialization
    * `Scan ExistingRDD` stub. Every other entry point (Verify, Bench,
    * specs) materializes normally. */
  @volatile var keepLazyForPlans: Boolean = false

  /** Materialize a BOUNDED declared result (localCheckpoint — the
    * m3/m4 precedent) and release the corpus-sized caches the query
    * held, so repeated invocations in a long-lived session don't
    * accumulate cacheManager entries (r10 advice on e61/e64). Under
    * [[keepLazyForPlans]] the lazy pipeline is returned unchanged and
    * the caches stay registered — the plan-dump run is one short-lived
    * JVM, and the dump must keep its exchange/aggregate evidence. */
  def materializeAndRelease(df: DataFrame, caches: DataFrame*): DataFrame =
    if (keepLazyForPlans) df
    else {
      val mat = df.localCheckpoint()
      caches.foreach(_.unpersist(blocking = false))
      mat
    }

  /** Hash-spread `df` by `key` ONLY when the scan yields too few splits
    * to feed the session's parallelism. A local few-file fixture
    * arrives as one input split, which would serialize the heavy
    * per-row stages that follow (shingling, 50× explode fan-outs) —
    * but at real scale the parquet scan already carries thousands of
    * splits and the same exchange would ship the whole table for
    * nothing before any reduction. Gating on the scan's actual
    * effective-split count keeps the local fixtures wide AND keeps the
    * 100 TB plan exchange-free; reading footers runs no Spark job.
    *
    * Two traps shaped this gate, both measured at sfx10 (500 k docs in
    * one 78 MB single-row-group file):
    *
    *  1. PLANNED splits lie. Spark's bytesPerCore sizing cuts that file
    *     into ~20 byte-range splits — more than the target, so a
    *     `getNumPartitions` gate stands down — but a parquet split only
    *     yields the row groups whose MIDPOINT it contains, so 19 splits
    *     are empty and every row lands in one task (e44 ran 250 s on
    *     one core). The unit of parquet scan parallelism is the ROW
    *     GROUP, so the gate counts row groups from file footers
    *     (`df.inputFiles` + a footer read per file, capped: it stops as
    *     soon as the target is met, and skips footers entirely when the
    *     file count alone clears it — a production corpus with
    *     thousands of files never reads one).
    *  2. AQE un-spreads a bare `repartition(key)`. The spread exists
    *     precisely when shuffle BYTES are tiny but downstream per-row
    *     CPU is huge (HOF tokenization, shingle fan-outs), which is the
    *     regime where AQE's byte-count heuristic coalesces the exchange
    *     right back to ~1 partition. An explicit numPartitions is a
    *     user-pinned width AQE respects. */
  def spreadIfNarrow(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    // bench-probe hook: the no-spread arm of the width sweep (SCALE.md)
    // — checked BEFORE the splits probe so the excluded arm also skips
    // the parquet footer reads the probe pays (r10 advice)
    if (sys.env.contains("GRAFT_NO_SPREAD")) return df
    val sc = df.sparkSession.sparkContext
    val target = math.max(2, sc.defaultParallelism / 2)
    val (splits, rows) = effectiveSplits(df, target)
    if (splits >= target) df
    else {
      // Width is ROWS-PROPORTIONAL, not a blanket defaultParallelism pin
      // (r9 verdict asked to reclaim the pin's fixture-scale cost).
      // Measured on e6 at sf0.1 (5k docs), same session, interleaved
      // median-of-3: no spread 3.80 s, 3-way 3.17 s, 20-way 2.72 s,
      // 10-way 2.42 s (the r9 32-way artifact read 3.27 s) — BOTH
      // under- and over-splitting lose: too narrow serializes the HOF
      // fan-out, too wide schedules dozens of near-empty tasks across
      // every map stage the spread partitioning feeds. One task per
      // `SpreadRowsPerTask` rows sits at that measured optimum and
      // scales: 50k+ rows saturate full width exactly as before.
      // Unknown row counts (non-parquet fallback) keep the
      // conservative full width — the spread exists precisely because
      // the input was judged narrow.
      val width =
        if (rows < 0) sc.defaultParallelism
        else math.min(sc.defaultParallelism.toLong,
          math.max(2L, (rows + SpreadRowsPerTask - 1) / SpreadRowsPerTask)).toInt
      df.repartition(width, key)
    }
  }

  /** Per-task row budget for the staging spread — the measured optimum
    * of the e6/e44 width sweep above (512 ⇒ 10 tasks at 5k rows, full
    * width from ~16k rows up). Env override is a bench-probe hook only
    * (the width sweeps in SCALE.md use it); production never sets it. */
  private val SpreadRowsPerTask =
    sys.env.get("GRAFT_SPREAD_ROWS_PER_TASK").map(_.toLong).getOrElse(512L)

  /** (row groups, total rows) feeding `df` — the row-group count
    * decided only far enough against `target`, the row count summed
    * from the same footers (-1 when unknown). Non-parquet inputs
    * (memory relations, streaming sources) fall back to the planned
    * partition count with unknown rows.
    *
    * The `files.length >= target` fast path ASSUMES every file holds
    * at least one non-empty row group (r9 advisory): a corpus of many
    * tiny or empty files could clear it while real scan parallelism is
    * ~1. Performance-only exposure — the spread is never load-bearing
    * for correctness — and the production corpora this path exists for
    * (thousands of executor-written shards) make empty shards rare by
    * construction; accepting it keeps the path free of per-file
    * footer/size RPCs, which is its entire point. */
  private def effectiveSplits(df: DataFrame, target: Int): (Int, Long) = {
    val files = try df.inputFiles catch { case _: Throwable => Array.empty[String] }
    if (files.isEmpty) return (df.rdd.getNumPartitions, -1L)
    if (files.length >= target) return (files.length, -1L)
    val conf = df.sparkSession.sessionState.newHadoopConf()
    var groups = 0
    var rows = 0L
    var rowsKnown = true
    val it = files.iterator
    while (groups < target && it.hasNext) {
      val f = it.next()
      try {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(f), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val gs = r.getRowGroups
          groups += gs.size
          gs.forEach(g => rows += g.getRowCount)
        } finally r.close()
      } catch { case _: Throwable =>
        groups += 1 // unreadable footer: count the file, rows unknowable
        rowsKnown = false
      }
    }
    // an early stop at `target` leaves `rows` partial — but the caller
    // only consults rows when groups < target, i.e. when every footer
    // was read, so the partial sum is never the one acted on
    (groups, if (rowsKnown && !it.hasNext) rows else -1L)
  }
}
