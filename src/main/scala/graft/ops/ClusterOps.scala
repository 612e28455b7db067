package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Dedup endgame + event-funnel analytics. */
object ClusterOps {

  /** Iteration cap for e16's label propagation — far above any real
    * near-dup cluster diameter; the convergence guard throws loudly if
    * it is ever hit. */
  val MaxCcIters = 100

  /** Reliable checkpoint location for iterative queries. `checkpoint()`
    * (vs `localCheckpoint()`) writes blocks to this directory — an
    * HDFS-compatible path at cluster scale — so an executor loss
    * mid-loop recovers from persisted files instead of killing the query
    * (localCheckpoint stores blocks on executors AND truncates lineage,
    * making the loss unrecoverable). Override via GRAFT_CHECKPOINT_DIR. */
  def ensureCheckpointDir(s: SparkSession): String = synchronized {
    s.sparkContext.getCheckpointDir.getOrElse {
      val dir = sys.env.getOrElse("GRAFT_CHECKPOINT_DIR",
        sys.env.getOrElse("GRAFT_FIXTURE_DIR", "/root/repo/target/fixtures")
          + "/checkpoints")
      s.sparkContext.setCheckpointDir(dir)
      s.sparkContext.getCheckpointDir.get
    }
  }

  /** Checkpoint files backing a checkpointed DataFrame (empty when the
    * plan isn't a checkpoint scan — cleanup is strictly best-effort). */
  private def checkpointFiles(df: DataFrame): Seq[String] =
    scala.util.Try {
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.analyzed.collect {
          case lr: org.apache.spark.sql.execution.LogicalRDD =>
            lr.rdd.getCheckpointFile.toSeq
        }.flatten
    }.getOrElse(Seq.empty)

  private def deleteFiles(s: SparkSession, files: Seq[String]): Unit =
    files.foreach { f =>
      scala.util.Try {
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }

  /** E16: duplicate clusters — connected components over the near-dup
    * pair graph (exact-hash pairs ∪ n-gram-Jaccard pairs), labeling each
    * clustered document with its component's minimum doc_id (the
    * canonical keeper). This is the step that turns pairwise similarity
    * into actual dedup decisions.
    *
    * Algorithm: FRONTIER-based min-label propagation to fixpoint — the
    * standard Pregel-style connected components, but each round only the
    * nodes whose label changed last round send messages, so late rounds
    * (when most labels have converged) join a shrinking frontier instead
    * of the full vertex set. Each iteration is one distributed
    * join+aggregate; the driver only checks convergence (count of
    * changed labels), never touches row data. Iterations are bounded by
    * the graph diameter (near-dup clusters are shallow; hard-capped at
    * [[MaxCcIters]] with a loud failure). At 100 TB the same loop runs
    * unchanged — state is two (node, label) columns, each step shuffles
    * by node id, and per-iteration state is RELIABLY checkpointed (see
    * [[ensureCheckpointDir]]) so executor loss mid-loop is survivable. */
  def e16DedupClusters(s: SparkSession, d: String): DataFrame = {
    ensureCheckpointDir(s)
    // exact-duplicate pairs: same normalized content hash (the one
    // definition shared with e1TextDedup)
    val h = documents(s, d).select(col("doc_id"),
      sha2(TextOps.norm(col("text")), 256).as("ch"))
    val exactPairs = h.as("a").join(h.as("b"),
      col("a.ch") === col("b.ch") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
    val (nearPairsFull, e8Caches) = SimOps.e8NgramJaccardWithCaches(s, d)
    val nearPairs = nearPairsFull.select("d1", "d2")
    val undirected = exactPairs.unionByName(nearPairs).distinct()
    // The edge set is probed by every iteration: reliable checkpoint —
    // durable files AND a truncated logical plan, so each round's analysis
    // sees a leaf scan instead of re-optimizing the embedded e8 pipeline
    // (measured 8 s -> 13 s when this was a persist with intact lineage).
    val edges = undirected.select(col("d1").as("a"), col("d2").as("b"))
      .unionByName(undirected.select(col("d2").as("a"), col("d1").as("b")))
      .checkpoint() // eager — e8's caches are releasable from here on
    e8Caches.foreach(_.unpersist(blocking = false))
    val verts = edges.select(col("a").as("node")).distinct()

    var labels = verts.withColumn("lbl", col("node")).checkpoint()
    // round 0: every node is in the frontier (all labels "changed" at init)
    var frontier = labels
    var changed = frontier.count()
    var iter = 0
    // Each round's state goes through a RELIABLE checkpoint: durable
    // files (executor loss recovers; the reason localCheckpoint was
    // dropped) and a truncated logical plan (the analyzer sees a leaf
    // scan, not an ever-deeper join tree). Measured equal to a fancier
    // persist-with-interval-checkpoint scheme at sf0.1 — the simple form
    // wins on both fault story and code.
    while (changed > 0 && iter < MaxCcIters) {
      val msgs = edges
        .join(frontier, edges("b") === frontier("node"))
        .groupBy(col("a")).agg(min(col("lbl")).as("nbl"))
      // carry the old label through so convergence is one filter+count
      // over the checkpointed result, not an extra join per iteration
      val next = labels.join(msgs, labels("node") === msgs("a"), "left")
        .select(col("node"), col("lbl").as("old"),
          least(col("lbl"), coalesce(col("nbl"), col("lbl"))).as("lbl"))
        .checkpoint()
      frontier = next.where(col("lbl") =!= col("old")).select("node", "lbl")
      val prevFiles = checkpointFiles(labels)
      changed = frontier.count() // materializes `next`
      // each checkpoint truncates lineage, so once `next` is on disk the
      // PREVIOUS round's files back nothing — delete them (the loop would
      // otherwise leak one state snapshot per round per run)
      deleteFiles(s, prevFiles)
      labels = next.drop("old")
      iter += 1
    }
    // the loop is done with the edge snapshot too; only the final labels
    // checkpoint (which the returned plan reads) must outlive this call
    deleteFiles(s, checkpointFiles(edges))
    // diameter-bound exceeded: labels would be silently wrong vs the
    // exact recursive-CTE oracle — fail loudly instead
    if (changed > 0)
      throw new IllegalStateException(
        s"e16 label propagation did not converge in $iter rounds " +
          s"($changed labels still changing) — raise the iteration cap")
    val sized = labels
      .withColumn("cluster_id", col("lbl")).drop("lbl")
      .withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("cluster_id"))))

    sized.select(col("node").as("doc_id"), col("cluster_id"), col("cluster_size"))
      .orderBy("doc_id")
  }

  /** E15: signup→purchase funnel — per user, the first signup and the
    * first purchase at-or-after it, with conversion delay. One scan per
    * event type + an equi-join on user_id; the time predicate filters
    * after the join (no range-join explosion). */
  def e15Funnel(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val signup = ev.where(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("t_signup"))
    val conv = ev.where(col("event_type") === "purchase")
      .join(signup, "user_id")
      .where(col("ts") >= col("t_signup"))
      .groupBy("user_id").agg(min(col("ts")).as("t_conv"))
    signup.join(conv, Seq("user_id"), "left")
      .select(
        col("user_id"),
        unix_timestamp(col("t_signup")).as("signup_s"),
        unix_timestamp(col("t_conv")).as("conv_s"),
        col("t_conv").isNotNull.as("converted"),
        (unix_timestamp(col("t_conv")) - unix_timestamp(col("t_signup")))
          .as("delay_s"))
      .orderBy("user_id")
  }
}
