package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Cold-cache + bytes-read A/B for the vector serve probes
  * (`runMain graft.ServeColdBench <sfDir> [keys...]`).
  *
  * Why this exists: the IVF-PQ format's claim is READ VOLUME (stored
  * codes are ~30× smaller than the float column; the refine fetch is
  * O(survivors) tiny row groups), but on local[32] every timed probe
  * reads from a warm OS page cache, where 640 MB and 40 MB cost nearly
  * the same wall-clock and the measurement degenerates to Spark job
  * count. This main measures what the bench cannot:
  *
  *  - bytes read per probe (SparkListener task input metrics — the
  *    number that scales to a cluster reading cold object storage);
  *  - wall with the page cache WARM (the bench's number);
  *  - wall with the page cache DROPPED (sync + vm/drop_caches, root
  *    only — a one-probe simulation of cold storage I/O).
  *
  * JIT is warmed on a prior run of the same key, so the cold number
  * isolates I/O, not compilation. One JSON line per key. */
object ServeColdBench {

  private val bytes = new AtomicLong(0L)

  private def dropCaches(): Boolean = scala.util.Try {
    Runtime.getRuntime.exec(Array("sync")).waitFor()
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/proc/sys/vm/drop_caches"),
      "3\n".getBytes("UTF-8"))
    true
  }.getOrElse(false)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sfx1000e")
    val keys =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("e2_cosine_topk", "e2v_ivf_serve", "e2pq_ivfpq_probe")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the refine-fetch In-list must push as an exact predicate here
      // too — this bench MEASURES that fetch (IvfServe.InFilterThresholdPin)
      .config("spark.sql.parquet.pushdown.inFilterThreshold",
        graft.sources.IvfServe.InFilterThresholdPin.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytes.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    })
    def runOnce(name: String): (Double, Long) = {
      spark.catalog.clearCache()
      val b0 = bytes.get()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      ((System.nanoTime() - t0) / 1e9, bytes.get() - b0)
    }
    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    keys.foreach { name =>
      runOnce(name) // builds the layout if stale + warms JIT and cache
      val (warmWall, warmBytes) = runOnce(name)
      val dropped = dropCaches()
      val (coldWall, coldBytes) = runOnce(name)
      println(s"""{"key":"$name","sf":"$sfDir","bytes_read":$warmBytes,""" +
        s""""wall_warm":${fmt(warmWall)},"wall_cold":${fmt(coldWall)},""" +
        s""""cold_bytes":$coldBytes,"cache_dropped":$dropped}""")
    }
    readSets(spark, sfDir)
    spark.stop()
  }

  /** Footer-measured READ SETS — the exact column-chunk bytes each
    * probe's scan selects, from the layout's own parquet metadata (the
    * s2b "footer-measured pruning" discipline; task input metrics
    * under-report on local file:// reads). This is the number that
    * scales to a cluster reading cold object storage:
    *  - e2v: vec_id + embedding chunks of the probed cells;
    *  - e2pq ADC: vec_id + c0..c7 chunks of the probed cells;
    *  - e2pq fetch: vec_id + embedding chunks of ONLY the refine row
    *    groups whose [min,max] vec_id range contains a survivor id. */
  private def readSets(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val root = graft.sources.IvfServe.serveDir(sfDir)
    def parquetFiles(dir: String): Seq[org.apache.hadoop.fs.Path] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).toSeq.filter(_.isFile)
        .map(_.getPath).filter(_.getName.endsWith(".parquet"))
    }
    /** (chunk bytes of `cols`, groups touched, groups total) over the
      * files, counting a group only if `touch` accepts its vec_id
      * [min, max] range. */
    def measure(files: Seq[org.apache.hadoop.fs.Path], cols: Set[String],
        touch: (Long, Long) => Boolean): (Long, Long, Long) = {
      var bytes = 0L; var hit = 0L; var total = 0L
      files.foreach { f =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
        try r.getFooter.getBlocks.asScala.foreach { b =>
          total += 1
          val idStats = b.getColumns.asScala
            .find(_.getPath.toDotString == "vec_id").map(_.getStatistics)
          val (lo, hi) = idStats match {
            case Some(s: org.apache.parquet.column.statistics.LongStatistics) =>
              (s.getMin, s.getMax)
            case _ => (Long.MinValue, Long.MaxValue)
          }
          if (touch(lo, hi)) {
            hit += 1
            bytes += b.getColumns.asScala
              .filter(c => cols.contains(c.getPath.toDotString))
              .map(_.getTotalSize).sum
          }
        } finally r.close()
      }
      (bytes, hit, total)
    }
    val cells = graft.sources.IvfServe.probedCells(spark, sfDir, 1)
    val cellFiles = cells.flatMap(c => parquetFiles(s"$root/lists/cell=$c"))
    val (vBytes, _, _) = measure(cellFiles,
      Set("vec_id", "embedding.list.element", "embedding"), (_, _) => true)
    val codeCols = (0 until graft.sources.IvfServe.PqM).map(m => s"c$m").toSet
    val (adcBytes, _, _) = measure(cellFiles, codeCols + "vec_id", (_, _) => true)
    val (topR, _, _) = graft.sources.IvfServe.e2pqAdcLeg(spark, sfDir)
    val ids = topR.collect().map(_.getLong(1)).distinct.sorted
    val (fBytes, fHit, fTotal) = measure(parquetFiles(s"$root/fetch"),
      Set("vec_id", "embedding.list.element", "embedding"),
      (lo, hi) => ids.exists(id => id >= lo && id <= hi))
    println(s"""{"read_sets":"$sfDir","probed_cells":${cells.size},""" +
      s""""e2v_bytes":$vBytes,"adc_bytes":$adcBytes,"fetch_bytes":$fBytes,""" +
      s""""fetch_groups_touched":$fHit,"fetch_groups_total":$fTotal,""" +
      s""""survivor_ids":${ids.length}}""")
  }
}
