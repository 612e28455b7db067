package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: the production RAG serving stack's top query
  * shape — a LEXICAL retriever (BM25 over the document corpus, e35's
  * statistics discipline) and a VECTOR retriever (the trained-IVF
  * multi-probe over the embeddings layout, e2w's probe discipline)
  * fused by reciprocal-rank fusion into one ranked answer. Neither leg
  * alone is what a retrieval system ships: keyword search misses
  * paraphrases, vector search misses exact identifiers; RRF is the
  * standard parameter-free fusion (Cormack et al., SIGIR 2009 — rank
  * positions only, so the two legs' incomparable score scales never
  * meet).
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
    * 100 TB path: the lexical leg is one pass of partial-aggregated
    * tf/df statistics (e35's shapes — no window over corpus-sized
    * relations) with the ≤ NQueries×QTerms query-term dim BROADCAST
    * into the tf relation, so only rows sharing a query term are ever
    * scored; the vector leg reads nprobe/K of the corpus through the
    * partition-pruned trained layout and keeps top-LegK on map-side
    * bounded heaps; fusion joins two ≤ NQueries×LegK relations — a
    * driver-trivial tail at any corpus size. */
  def e71HybridRrf(s: SparkSession, d: String): DataFrame = {
    val (k1, b) = (1.2, 0.75)
    val toks = SimOps.tokensArr
    val docs = graft.Tables.spreadIfNarrow(graft.Tables.documents(s, d),
      col("doc_id"))
    // tf is PERSISTED (the e6 shared-sub-relation discipline): four
    // consumers read it (scoring join, dfreq, doc lengths, query-term
    // selection), and unpersisted each would re-tokenize and re-shuffle
    // the corpus — measured ~3 full tf evaluations at sfx100. Doc
    // length dl is derived as sum(tf) per doc instead of a second
    // tokenization pass (identical value: tokens are counted either
    // way; the oracle's len(w) agrees).
    val tf = docs.select(col("doc_id"), explode(toks).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lens = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val stats = lens.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // query terms: each query doc's top-QTerms by (tf desc, term asc) —
    // the window sorts ≤ the query docs' own vocabularies, never the
    // corpus (the tf relation is pre-filtered to q_id rows)
    val qsel = tf.where(col("doc_id") < NQueries)
      .withColumn("r", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("tf").desc, col("term"))))
      .where(col("r") <= QTerms)
      .select(col("doc_id").as("q_id"), col("term"))
    // attach df: broadcast the tiny term set INTO dfreq (≤ N·Q rows out)
    val qterms = dfreq.join(broadcast(qsel), Seq("term"))
    val lexScored = tf.join(broadcast(qterms), Seq("term"))
      .where(col("doc_id") =!= col("q_id"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        log(lit(1.0) +
          (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("q_id", "doc_id")
      .agg(round(sum(col("contrib")), 6).as("lex_score"))
    val lexTop = graft.plans.TopKPerKey.topKPerKey(lexScored, LegK,
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
