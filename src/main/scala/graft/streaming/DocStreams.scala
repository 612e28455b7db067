package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.SimOps

/** Structured-Streaming similarity INGEST — the one LLM-pipeline
  * capability whose batch forms (e6/e7b/e8) had no streaming analogue:
  * documents arrive incrementally and each new document is probed
  * against the already-indexed corpus for near-duplicates BEFORE it is
  * admitted — the shape a production training-data pipeline actually
  * runs (dedup at ingest, not as a nightly batch). Reference analogue:
  * the page-at-a-time incremental scrape that checks each new page
  * against the seen-set as it lands
  * (`/root/reference/web_scrpaer_2.py:246-281`).
  *
  * Plan shape (the 100 TB story): the arriving micro-batch computes its
  * band signatures PER ROW (higher-order array functions — no shuffle at
  * all on the stream side), then equi-joins the static corpus band index
  * on (band, band_hash). The stream side is stateless — no watermark, no
  * state store; the only per-batch cost is the index probe. At scale the
  * index is a compact persisted table (8-byte keys in the xx family;
  * md5 here for the DuckDB oracle), and the probe is the same
  * candidate-volume-∝-true-dups equi-join as batch e6 — never all-pairs
  * against the corpus. */
object DocStreams {

  /** Schema of the documents parquet (TESTDATA.md). */
  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Bucketed staging for the document stream: the single documents
    * parquet split once into `nBuckets` contiguous doc_id-range files,
    * mtimes staggered so the file source replays them in ARRIVAL ORDER
    * one per micro-batch — the landing shape of an incremental corpus
    * ingest. Same staleness protocol as the events staging: (size,
    * mtime) signature marker AND every expected bucket file present
    * (a surviving marker over deleted buckets must not pass as fresh). */
  def docsStreamBucketed(s: SparkSession, dir: String, nBuckets: Int): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    import scala.util.Using
    val src = Paths.get(dir, "documents.parquet")
    val landing = Paths.get(
      sys.env.getOrElse("GRAFT_FIXTURE_DIR", "/root/repo/target/fixtures"),
      "stream-docs-bucketed",
      graft.util.PathKeys.keyedName(dir) + s"-$nBuckets")
    synchronized {
      val marker = landing.resolve("_STAGED")
      val sig = s"${Files.size(src)}:${Files.getLastModifiedTime(src).toMillis}"
      val bucketsPresent = (0 until nBuckets)
        .forall(i => Files.exists(landing.resolve(f"docs-$i%03d.parquet")))
      val stale = !Files.exists(marker) || !bucketsPresent ||
        new String(Files.readAllBytes(marker), "UTF-8") != sig
      if (stale) {
        if (Files.exists(landing)) deleteTree(landing)
        Files.createDirectories(landing)
        val raw = s.read.schema(docsSchema).parquet(src.toString)
        val bounds = raw.agg(min(col("doc_id")), max(col("doc_id"))).head()
        val (idMin, idMax) = (bounds.getLong(0), bounds.getLong(1))
        val span = math.max(1L, idMax - idMin + 1)
        val tmp = landing.resolve("_tmp")
        (0 until nBuckets).foreach { i =>
          val lo = idMin + span * i / nBuckets
          val hi = idMin + span * (i + 1) / nBuckets
          raw.where(col("doc_id") >= lo && col("doc_id") < hi)
            .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val part = Using.resource(Files.list(tmp)) { st =>
            st.iterator().asScala
              .find(_.getFileName.toString.endsWith(".parquet"))
              .getOrElse(sys.error(s"doc bucket $i produced no parquet part"))
          }
          val dst = landing.resolve(f"docs-$i%03d.parquet")
          Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
          // staggered mtimes: the file source replays oldest-first
          Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(1_000_000_000_000L + i * 60_000L))
        }
        deleteTree(tmp)
        Files.write(marker, sig.getBytes("UTF-8"))
      }
    }
    s.readStream
      .schema(docsSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landing.toString)
  }

  private def deleteTree(root: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    if (Files.exists(root))
      scala.util.Using.resource(Files.walk(root)) { st =>
        st.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(p => Files.deleteIfExists(p))
      }
  }

  /** The match stream: arriving docs' per-row band signatures probed
    * against a static corpus band index — emits one (d1, d2, band) row
    * per band collision, both docs ordered. Stateless (stream-static
    * inner equi-join + projections), so append mode needs no watermark.
    * Shared by the declared query and StreamSimilaritySpec's restart
    * drive. */
  private[graft] def e6sMatchStream(
      s: SparkSession, dir: String, index: DataFrame, nBuckets: Int): DataFrame =
    SimOps.perRowBands(docsStreamBucketed(s, dir, nBuckets))
      .select(col("doc_id").as("d_new"), col("band"), col("bh"))
      .join(index, Seq("band", "bh"))
      .where(col("d_new") =!= col("d_idx"))
      .select(least(col("d_new"), col("d_idx")).as("d1"),
        greatest(col("d_new"), col("d_idx")).as("d2"), col("band"))

  /** E6s: STREAMING MinHash+LSH ingest, declared with BATCH-PARITY
    * oracle — the drained stream output must verify to exactly e6's
    * rows (same DuckDB SQL gates both).
    *
    * Why parity holds: the static index holds every corpus doc's band
    * rows, so whichever of a colliding pair arrives first already finds
    * the other; a pair colliding in a band is emitted once or twice
    * (once per direction when both arrive) → `distinct` over
    * (d1, d2, band) collapses to exactly the batch collision set, and
    * the per-pair band count equals batch n_bands. The verification
    * tail is literally the batch code (SimOps.minhashVerify) over the
    * same persisted shingle relation. */
  def e6sMinhashStream(s: SparkSession, dir: String): DataFrame = {
    val rel = SimOps.minhashRelations(s, dir,
      mh = (h, sh) => md5(concat(lit(s"$h:"), sh)),
      bandHash = (a, b) => md5(concat(a, b)))
    // the probe side of every micro-batch — cache the index, not the plan
    val index = rel.bands.select(col("doc_id").as("d_idx"), col("band"), col("bh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val name = EventStreams.drainToTable(s,
      e6sMatchStream(s, dir, index, nBuckets = 4), "e6s_match_table", "append")
    // The verify tail references `pairs` on both sides of a join; a
    // MemorySink view is not re-instanceable, so those references can't
    // be deduplicated analysis-side. localCheckpoint materializes the
    // pair aggregate once (bounded by candidate pairs — a vanishing
    // fraction of the corpus) into a re-instanceable leaf.
    val pairs = s.table(name).distinct()
      .groupBy("d1", "d2").agg(count(lit(1)).as("n_bands"))
      .localCheckpoint(eager = true)
    SimOps.minhashVerify(rel, pairs).orderBy("d1", "d2")
  }
}
