package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** Physical-plan assertions — the 100 TB design contract (VERDICT r1
  * §performance): broadcast where a dim is small, no all-pairs products
  * on the similarity path, filters pushed into the parquet scan, top-k
  * instead of global sort. These fail the build if a refactor regresses
  * the plan shape, not just the answer. */
class PlanShapeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("J1 enum decode is a BroadcastHashJoin, never a shuffle join") {
    val p = plan(Relational.j1BroadcastDecode(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(5).mkString("\n"))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"))
  }

  test("E2 IVF cosine top-k: BroadcastHashJoin on the cell key, no cartesian product") {
    val p = plan(SimOps.e2CosineTopk(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"),
      "an all-pairs product on the vector table is the guaranteed 100 TB scale-killer")
  }

  test("E6 MinHash LSH pair generation joins on the band hash, no cartesian product") {
    val p = plan(SimOps.e6MinhashLsh(spark, sf))
    assert(!p.contains("CartesianProduct"))
  }

  test("E6 persists the shingle relation: plan reads the cache, not the tokenize subtree") {
    val p = plan(SimOps.e6MinhashLsh(spark, sf))
    assert(p.contains("InMemoryTableScan"),
      "the shared shingle/signature relations must come from the cache")
  }

  test("E7 SimHash runs with NO row fan-out: no cross/nested-loop join anywhere") {
    val p = plan(SimOps.e7Simhash(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the 16 bit votes must be aggregation columns, not a 16x row multiply")
    assert(!p.contains("Join"), "e7 is scan -> two hash aggs; any join is a regression")
  }

  test("X3 salted join replicates the dim via explode and stays an equi-join") {
    val p = plan(graft.plans.ScaleJoins.x3SaltedAgg(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("Generate explode"), "salt replication should be a Generate node")
  }

  test("E1x xxhash64 dedup: partial aggregation, hash computed in the scan stage") {
    val p = plan(TextOps.e1xTextDedupXx(spark, sf))
    assert(p.contains("xxhash64") && p.contains("HashAggregate"))
  }

  test("window top-k idiom gets Spark's native map-side WindowGroupLimit") {
    // the declarative rank-filter form must stay shuffle-bounded: Spark's
    // InferWindowGroupLimit inserts a partial per-key limit BELOW the
    // exchange (the built-in cousin of our TopKPerKey operator)
    val p = plan(SimOps.e2CosineTopk(spark, sf))
    assert(p.contains("WindowGroupLimit"),
      "rank filter should trigger InferWindowGroupLimit")
  }

  test("E2b LSH and E13 near-dup also avoid all-pairs products") {
    assert(!plan(SimOps.e2bCosineLsh(spark, sf)).contains("CartesianProduct"))
    assert(!plan(SimOps.e13EmbedNeardup(spark, sf)).contains("CartesianProduct"))
  }

  test("approx_count_distinct sketch lands within 5% of exact (scale fallback for COUNT DISTINCT)") {
    import org.apache.spark.sql.functions._
    val o = Tables.orders(spark, sf)
    val exact = o.select(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    val approx = o.select(approx_count_distinct(col("o_custkey"))).collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"approx=$approx exact=$exact")
  }

  test("S2 partition scan pushes its key predicate into the parquet reader") {
    val p = plan(Relational.s2PartitionScan(spark, sf))
    assert(p.contains("PushedFilters:") && p.contains("GreaterThanOrEqual(l_orderkey,1)"),
      p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
  }

  test("column pruning reaches the scan: P3 reads 3 columns, not 11") {
    val p = plan(Relational.p3TypeFilter(spark, sf))
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_orderkey") && !read.contains("l_extendedprice"),
      s"scan should not read unprojected columns: $read")
  }

  test("L1 limit rides TakeOrderedAndProject (partial top-k per task), no global sort") {
    val p = plan(Relational.l1Limit(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p.linesIterator.take(3).mkString("\n"))
  }

  test("un-ordered limit plans CollectLimit (early-stop scan, SURVEY L3)") {
    val df = Tables.orders(spark, sf).limit(5)
    assert(plan(df).contains("CollectLimit"))
  }

  test("J1b map-literal decode plans no join at all") {
    val p = plan(Relational.j1bMapDecode(spark, sf))
    assert(!p.contains("Join"), p.linesIterator.take(5).mkString("\n"))
  }

  test("A1 aggregation plans map-side partial aggregation") {
    val p = plan(Relational.a1CountGroup(spark, sf))
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      "groupBy must produce partial+final hash aggregation")
    assert(p.contains("HashAggregate"))
  }

  test("whole-stage codegen covers the scan→filter→project hot path (P2)") {
    // AQE finalizes the physical plan lazily — execute first, then inspect.
    val df = Relational.p2PrefixFilter(spark, sf)
    df.collect()
    // in the finalized AQE plan, codegen stages print as "*(n) Op"
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WholeStageCodegen") || p.linesIterator.exists(_.contains("*(")), p)
  }

  test("ORD role decode (reverse) broadcasts its 11-row dim") {
    val p = plan(graft.ord.OrdPipeline.ordJ1RoleEncode(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
  }

  // r8-key shape pins (VERDICT r8 item 8): the load-bearing rewrites a
  // future Spark upgrade could silently undo.

  test("E25 as-of join is ONE user_id exchange + window, never a range product") {
    val p = plan(EventOps.e25AsofJoin(spark, sf))
    // the union-and-carry idiom has no join at all — a Join node means
    // the rewrite regressed to the quadratic-per-user t2<=t1 form
    assert(!p.contains("Join"), "e25 must carry purchases via a window, not join them")
    assert(p.contains("Window"), "the as-of carry is a running last() window")
    val exchanges = p.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 2,
      s"e25 should shuffle on user_id once (plus the final orderBy range exchange): $exchanges exchanges")
  }

  test("E30 sparse cosine generates pairs from posting lists, no N^2 join") {
    val p = plan(SimOps.e30SparseCosine(spark, sf))
    assert(!p.contains("CartesianProduct"))
    // pairs must explode PARTITION-LOCAL from each capped posting list —
    // this Generate is the whole scale contract (candidate volume is
    // bounded by the df<=64 cap, never N^2)
    assert(p.contains("Generate explode(slice"),
      "pair generation must be the partition-local posting-list double-explode")
    // the only nested-loop joins allowed are the broadcast of the 1-row
    // corpus count (crossJoin(broadcast(nDocs)) — VERDICT-sanctioned);
    // they print as BuildRight Cross over a 1-row aggregate
    val bnlj = p.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(bnlj.forall(_.contains("BuildRight, Cross")),
      s"unexpected nested-loop join shape: ${bnlj.mkString("; ")}")
  }

  test("E33 range join runs as a bucket EQUI-join with partial-agg argmax") {
    val p = plan(EventOps.e33RangeJoin(spark, sf))
    // the bucketization rewrite: containment becomes hash(bucket) equi-join
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "a nested-loop theta join re-scans every interval per probe row")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      "the bucket join must be an equi-join (hash or sort-merge), keyed on the bucket")
    // argmax collapses candidates map-side: the partial min sits BELOW
    // the exchange, so shuffled bytes stay one row per purchase however
    // dense the windows get
    assert(p.contains("partial_min"),
      "candidate rows must collapse in a partial aggregate before the exchange")
    // the argmax is packed into one long so the election stays in
    // HashAggregate — a struct buffer would plan SortAggregate (a
    // per-partition sort of the candidate relation; the Amplify
    // labeler's 77 GB-spill shape at 2e10 rows)
    assert(!p.contains("SortAggregate"),
      "the packed-long argmax must plan as HashAggregate, never SortAggregate")
  }

  test("argmax repack: e28/e39/e34 keeper elections plan HashAggregate, never SortAggregate") {
    // the r10 verdict's one weak family: struct-valued argmin/argmax
    // buffers are not UnsafeRow-mutable, so Spark silently falls back
    // to SortAggregate — a per-partition SORT of the corpus-sized
    // pre-aggregation relation. All three keys now pack (value, id)
    // into one long (e39 dictionary-encodes the source string first);
    // this pin fails the build if a refactor reintroduces the struct.
    val probes = try {
      graft.Tables.keepLazyForPlans = true // e39 materializes-and-releases
      Seq(
        "e28" -> plan(CurationOps.e28PassageDedup(spark, sf)),
        "e39" -> plan(CurationOps.e39DomainGate(spark, sf)),
        "e34" -> plan(SimOps.e34CentroidKeeper(spark, sf)))
    } finally graft.Tables.keepLazyForPlans = false
    for ((name, p) <- probes) {
      assert(p.contains("HashAggregate"), s"$name lost its hash aggregation")
      assert(!p.contains("SortAggregate"),
        s"$name keeper election fell back to SortAggregate:\n" +
          p.linesIterator.filter(_.contains("Aggregate")).mkString("\n"))
    }
  }

  test("E22/E70 packing window partitions by (source, shard) — bounded per-task sort at any skew") {
    // r12 verdict ask #6: the running-offset window keyed by source
    // alone sorts a whole source per task; the shard key (e26's md5
    // hash) makes the no-global-sort claim STRUCTURAL — per-task sort
    // volume is |source|/64 at any source skew
    val p = plan(CurationOps.e22SeqPack(spark, sf))
    val winLine = p.linesIterator.find(_.contains("Window ")).getOrElse("")
    assert(winLine.contains("source") && winLine.contains("shard"),
      s"packing window must partition by (source, shard): $winLine")
    // keepLazyForPlans: e70's materializeAndRelease would otherwise
    // collapse the dump to Scan ExistingRDD (the r11 localCheckpoint
    // lesson)
    Tables.keepLazyForPlans = true
    try {
      val p70 = plan(CurationOps.e70CurationPipeline(spark, sf))
      val win70 = p70.linesIterator.find(_.contains("Window ")).getOrElse("")
      assert(win70.contains("source") && win70.contains("pack_shard"),
        s"e70 stage-5 window must partition by (source, pack_shard): $win70")
    } finally Tables.keepLazyForPlans = false
  }

  test("E36 epoch order: the shard window's exchange is reused by the final aggregation") {
    val p = plan(CurationOps.e36EpochOrder(spark, sf))
    // one hashpartitioning exchange (window on shard; groupBy(shard) is
    // satisfied by it in place) + the final orderBy's range exchange —
    // a second hash exchange means the sort/agg stopped sharing the
    // shard partitioning and the shard-writer shape is gone
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 1, s"expected exactly one hash exchange, got $hashEx:\n" +
      p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    assert(!p.contains("CartesianProduct") && !p.contains("Join"))
  }

  test("spreadIfNarrow: fans out a single-split scan, identity on an already-wide one") {
    import org.apache.spark.sql.functions.col
    val narrow = spark.range(0, 1000, 1, 1).toDF("doc_id")
    val wide = spark.range(0, 1000, 1, 8).toDF("doc_id")
    val spreadN = graft.Tables.spreadIfNarrow(narrow, col("doc_id"))
    val spreadW = graft.Tables.spreadIfNarrow(wide, col("doc_id"))
    assert(plan(spreadN).contains("Exchange hashpartitioning"),
      "a one-split local fixture must be spread before heavy per-row stages")
    assert(!plan(spreadW).contains("Exchange"),
      "a scan already wide enough for the session parallelism must NOT pay a staging shuffle")
  }
}
