package graft.streaming

import org.apache.spark.sql.SparkSession

/** Scale-adaptive shuffle width for streaming drains (optimization
  * guide §2.2/§2.5: derive partitioning from the DATA, never from a
  * constant tuned to one host).
  *
  * Why this exists: a stateful micro-batch query pins its STATE STORE
  * count to `spark.sql.shuffle.partitions` at its first batch, and the
  * session default (one partition per core) is a BATCH default. For the
  * drained declared keys it hands a ~2 MB file replay 32 state
  * partitions, so every micro-batch pays 32 store open/commit/delta
  * cycles PER STATEFUL OPERATOR (a stream-stream join keeps four stores
  * per partition) plus 32-task scheduling per stage — fixed overhead
  * that dominates the busy seconds the bench reports while each task
  * carries a few kilobytes of real work. At the other end, the same
  * host-derived constant silently UNDER-partitions a production ingest
  * whose per-interval state outgrows its executors.
  *
  * The drain width is therefore derived from the landing's size:
  * `ceil(bytes / SPARK_GRAFT_STREAM_PART_BYTES)` (default 512 KiB of
  * compressed landing per partition — [[DefaultPartBytes]], the
  * measured knee; see its scaladoc) clamped to [1, session width]. Local fixtures (≤ 2 MB)
  * get width 1 — the honest width for kilobytes of state; a landing
  * grows its width linearly until the session's own configuration caps
  * it, so a cluster session never narrows below what its operator
  * chose for batch work. The env override is the deployment knob that
  * actually matters at scale (target state bytes per partition).
  *
  * Scope discipline: the width is set on the session for the drain's
  * duration and RESTORED in a finally (the e16 loop-width precedent —
  * Verify/Bench run declared keys sequentially on one session;
  * StreamTuneSpec asserts restoration on both exit paths). A host
  * running concurrent queries on one session should isolate drains on
  * their own session instead.
  */
object StreamTune {

  /** Default target bytes of COMPRESSED landing data per stream shuffle
    * partition. 512 KiB of parquet expands to roughly 5–10 MB of keyed
    * in-memory state per partition (10–20× decode factor on these
    * schemas), which is the comfortable zone for the HDFS-backed state
    * store (each partition's whole map lives on-heap and is re-written
    * as a delta file EVERY micro-batch — partitions much smaller than
    * this pay pure commit overhead, much larger ones serialize row work
    * and bloat per-batch deltas). Measured on the sf0.1 events landing
    * (2 MB → width 4 vs the session's 32): e29 8.5→2.2 s, e29b
    * 14.8→3.0, e1sb 6.2→2.4, c4 2.7→0.7, e1s 1.5→0.6 busy seconds,
    * trigger counts unchanged — the removed time was per-store fixed
    * cost, not work. */
  val DefaultPartBytes: Long = 512L << 10

  private[graft] def targetPartBytes: Long =
    sys.env.get("SPARK_GRAFT_STREAM_PART_BYTES")
      .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
      .filter(_ > 0)
      .getOrElse(DefaultPartBytes)

  /** ceil(bytes / target) clamped to [1, sessionWidth]. */
  private[graft] def widthFor(bytes: Long, sessionWidth: Int,
      target: Long = targetPartBytes): Int = {
    val need = (math.max(0L, bytes) + target - 1) / target
    math.max(1L, math.min(sessionWidth.toLong, need)).toInt
  }

  /** Size of the file(s) a drain replays — a single parquet source or a
    * staged landing directory. Unreadable paths count 0 (the width then
    * floors at 1, never throws: sizing is advisory, the drain is not). */
  private[graft] def sourceBytes(paths: java.nio.file.Path*): Long =
    paths.map { p =>
      scala.util.Try {
        import scala.jdk.CollectionConverters._
        if (java.nio.file.Files.isDirectory(p)) {
          val st = java.nio.file.Files.walk(p)
          try st.iterator().asScala
            .filter(java.nio.file.Files.isRegularFile(_))
            .map(f => scala.util.Try(java.nio.file.Files.size(f)).getOrElse(0L))
            .sum
          finally st.close()
        } else java.nio.file.Files.size(p)
      }.getOrElse(0L)
    }.sum

  /** Run `body` (which must both START and fully DRAIN its streaming
    * queries) with the shuffle width sized to `bytes`; the session's
    * configured width is restored on every exit path. The conf must be
    * set BEFORE `start()` — a streaming query clones the session at
    * start and plans every micro-batch against that clone.
    *
    * At width 1 — the tiny-landing regime — AQE is additionally
    * disabled for the drain's duration (r16; the e16 loop-width
    * precedent): streaming plans disable it themselves, but foreachBatch
    * bodies run BATCH jobs, where AQE splits each single-partition
    * write/lookup into one job per query stage plus a replanning pass —
    * pure per-trigger overhead when every relation in flight is a few
    * KB. A landing big enough for width > 1 keeps AQE: its coalescing
    * and skew handling are exactly what a real ingest wants. */
  private[graft] def withDrainWidth[T](s: SparkSession, bytes: Long)(body: => T): T = {
    val conf = s.conf
    val prev = conf.get("spark.sql.shuffle.partitions")
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    val width = widthFor(bytes, prev.toInt)
    conf.set("spark.sql.shuffle.partitions", width.toString)
    if (width == 1) conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally {
      conf.set("spark.sql.shuffle.partitions", prev)
      conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  /** Spread an arriving micro-batch across the drain width BEFORE the
    * heavy per-row stage, gated on the data: a staged landing file
    * arrives as ONE input split, so everything until the first
    * exchange runs as a single task per trigger — invisible at
    * kilobyte fixtures, but the r16 sfx1 scaling run measured the e6s
    * band derivation serializing at ~4 s per trigger. The spread fires
    * only when one trigger carries at least [[SpreadMinParts]]
    * partitions' worth of landing bytes (the same
    * [[targetPartBytes]] unit the drain width derives from), keyed
    * deterministically (task-retry-safe, guide §2.5) — so tiny local
    * fixtures keep their exchange-free single-task plans and a real
    * ingest parallelizes its per-row work. */
  val SpreadMinParts = 2L

  private[graft] def spreadBatchIfWide(df: org.apache.spark.sql.DataFrame,
      key: org.apache.spark.sql.Column,
      bytesPerTrigger: Long): org.apache.spark.sql.DataFrame =
    if (bytesPerTrigger / targetPartBytes >= SpreadMinParts) {
      // EXPLICIT partition count, derived from the per-trigger bytes:
      // a bare repartition(key) resolves to spark.sql.shuffle.partitions
      // but AQE then coalesces the small exchange back to one partition
      // (measured at sfx1: the spread's reduce side ran 1-2 tasks and
      // the per-row stage stayed serial) — a user-specified count is
      // exempt from AQE coalescing, which is exactly the contract here.
      val n = widthFor(bytesPerTrigger,
        df.sparkSession.sparkContext.defaultParallelism)
      df.repartition(n, key)
    } else df

  /** [[withDrainWidth]] sized from the source files a drain replays. */
  private[graft] def withDrainWidthFrom[T](s: SparkSession,
      paths: java.nio.file.Path*)(body: => T): T =
    withDrainWidth(s, sourceBytes(paths: _*))(body)
}
