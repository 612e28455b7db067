package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-amplification generator: writes an N×-size copy of a testdata
  * directory for scaling-slope measurement (`Amplify <src> <dst> [N]`).
  *
  * Each copy c offsets every key domain by c × (max_key + 1), applied
  * consistently across fact/dimension FKs (orders.o_custkey moves with
  * customer.c_custkey, lineitem with orders/part/supplier), so joins
  * behave exactly as at 1× — N× the rows, N× the matched pairs, no
  * cross-copy edges. Content columns are made copy-DISJOINT where an
  * operator measures similarity: document tokens get a per-copy suffix
  * (so dedup/similarity candidate sets scale linearly instead of every
  * doc gaining N−1 artificial near-duplicates) and embedding labels move
  * to per-copy cells (more cells, constant cell size — the 100 TB IVF
  * shape). region/nation stay fixed: they are bounded dimensions at any
  * scale. Copy 0 is byte-identical content, so point lookups and
  * literal-keyed queries still hit.
  *
  * Deliberately a generator main, not a library op — interpreted lambda
  * transforms are fine here. */
object Amplify {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Amplify <srcDir> <dstDir> [factor]")
    val (src, dst) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    // one scan per table for ALL of its key-domain sizes
    def offs(df: DataFrame, cols: String*): Seq[Long] = {
      val row = df.agg(max(col(cols.head)).cast("long"),
        cols.tail.map(c => max(col(c)).cast("long")): _*).head()
      cols.indices.map(row.getLong(_) + 1)
    }

    /** Union of `factor` copies; per copy, `keyOffsets` columns shift by
      * c × domain-size and `extra` applies any content rewrite. */
    def amplify(t: String, keyOffsets: Map[String, Long],
        extra: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
      val base = read(t)
      val copies = (0 until factor).map { c =>
        val shifted = keyOffsets.foldLeft(base) { case (df, (k, o)) =>
          // preserve the source column type (a +long would widen ints)
          df.withColumn(k, (col(k) + lit(c * o)).cast(base.schema(k).dataType))
        }
        extra(shifted, c)
      }
      writeSingleFile(copies.reduce(_.unionByName(_)), s"$dst/$t.parquet")
      println(s"[amplify] $t x$factor done")
    }

    /** The driver's testdata ships each table as ONE parquet FILE (the
      * streaming staging copies `events.parquet` as a file), so the
      * amplified layout must match: write, then promote the single part
      * file to the bare path. */
    def writeSingleFile(df: DataFrame, path: String): Unit = {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      import scala.util.Using
      val tmp = path + ".dir"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Using.resource(Files.list(Paths.get(tmp))) { st =>
        st.toArray.map(_.toString).filter(_.endsWith(".parquet")).head
      }
      Files.move(Paths.get(part), Paths.get(path),
        StandardCopyOption.REPLACE_EXISTING)
      Using.resource(Files.walk(Paths.get(tmp))) { st =>
        st.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
      }
    }

    val Seq(oCust) = offs(read("customer"), "c_custkey")
    val Seq(oOrd) = offs(read("orders"), "o_orderkey")
    val Seq(oPart) = offs(read("part"), "p_partkey")
    val Seq(oSupp) = offs(read("supplier"), "s_suppkey")
    val Seq(oEvent, oUser) = offs(read("events"), "event_id", "user_id")
    val Seq(oDoc) = offs(read("documents"), "doc_id")
    val Seq(oVec, oLbl) = offs(read("embeddings"), "vec_id", "label")

    // bounded dimensions: identical at any scale
    Seq("region", "nation").foreach { t =>
      writeSingleFile(read(t), s"$dst/$t.parquet")
      println(s"[amplify] $t copied")
    }
    amplify("customer", Map("c_custkey" -> oCust))
    amplify("supplier", Map("s_suppkey" -> oSupp))
    amplify("part", Map("p_partkey" -> oPart))
    amplify("orders", Map("o_orderkey" -> oOrd, "o_custkey" -> oCust))
    amplify("lineitem", Map("l_orderkey" -> oOrd, "l_partkey" -> oPart,
      "l_suppkey" -> oSupp))
    amplify("events", Map("event_id" -> oEvent, "user_id" -> oUser))
    // per-copy token suffix keeps copies dissimilar; copy 0 untouched
    amplify("documents", Map("doc_id" -> oDoc), (df, c) =>
      if (c == 0) df
      else {
        val sfx = s"x$c"
        df.withColumn("text", array_join(
            transform(split(col("text"), " "), t => concat(t, lit(sfx))), " "))
          .withColumn("n_chars", length(col("text")).cast("long"))
      })
    amplify("embeddings", Map("vec_id" -> oVec, "label" -> oLbl))
    spark.stop()
  }
}
