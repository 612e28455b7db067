package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Relational operator inventory (SURVEY.md §2.1-2.9) re-expressed as
  * idiomatic Spark DataFrame plans over the driver test tables.
  *
  * Semantics derive from the reference pipelines
  * (`/root/reference/web_scraper.py`, `web_scrpaer_2.py`): pagination /
  * early-stop scans, key lookups, prefix/type filters, tagged-union
  * normalization, enum-decode broadcast joins, first-seen dedup, 1-based
  * end-inclusive slices. Each query ends in an explicit ORDER BY on a
  * unique key so the driver's hash compare is deterministic; the sort is
  * on final (usually aggregated or limited) output, not on scan paths.
  *
  * Scale notes (100 TB design point):
  *  - dimension decodes use `broadcast()` — never a shuffle join;
  *  - aggregations are plain `groupBy` so Catalyst plans partial
  *    (map-side) aggregation automatically;
  *  - scans carry their filters in the plan so parquet gets
  *    PushedFilters + column pruning (verified via explain in tests).
  */
object Relational {

  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** lineitem pre-partitioned by its group key for the collect_list
    * fan-in queries (F1/F2/F4/A4): locally the table arrives as ONE
    * input split, so the map-side partial aggregation would run
    * single-threaded; repartitioning first costs the same single
    * shuffle (the groupBy reuses the exchange) but runs the heavy
    * list aggregation 32-wide. */
  private def lineitemByOrder(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).repartition(col("l_orderkey"))

  // ---------------------------------------------------------------- S1-S3

  /** S1: catalog scan — enumerate ids, stop early (web_scrpaer_2.py:209-289).
    * DISTINCT + ORDER BY + LIMIT rides TakeOrderedAndProject; at cluster
    * scale the limit is pushed below the exchange (partial top-k per task).
    */
  def s1CatalogScan(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_custkey").as("id"))
      .distinct()
      .orderBy("id")
      .limit(100)

  /** S2: partition-pruned scan — records of one key range
    * (web_scrpaer_2.py:387-433). The BETWEEN predicate reaches the parquet
    * reader as PushedFilters (row-group pruning at scale). */
  def s2PartitionScan(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .where(col("l_orderkey").between(1, 64))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_quantity"))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
      // sort every output column so the hash compare is order-stable
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")

  /** S3: point lookup by key (web_scraper.py:112-253). The key is resolved
    * by a scalar-subquery-shaped min aggregate, then broadcast back against
    * the table — one scan for the agg, one pruned scan for the probe. */
  def s3PointLookup(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val minKey = o.agg(min(col("o_orderkey")).as("mk"))
    o.join(broadcast(minKey), col("o_orderkey") === col("mk"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
  }

  // ---------------------------------------------------------------- P1-P7

  /** P1: key-extraction projection — last URL segment
    * (web_scraper.py:37,100: `href.split('/')[-1]`). */
  def p1KeyExtract(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(
        col("o_orderkey"),
        element_at(
          split(concat(lit("https://example.org/d/ord-"), col("o_orderkey").cast("string")), "/"),
          -1).as("id"))
      .orderBy("o_orderkey")

  /** P2: prefix predicate — `startswith('ord-')` (web_scraper.py:101). */
  def p2PrefixFilter(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(
        when(col("o_orderkey") % 3 === 0, concat(lit("ord-"), col("o_orderkey").cast("string")))
          .otherwise(concat(lit("doc-"), col("o_orderkey").cast("string")))
          .as("id"))
      .where(col("id").startsWith("ord-"))
      .orderBy("id")

  /** P3: identifier-type filter — v1 keeps only SMILES (`type == 2`,
    * web_scraper.py:433,487); here the equality filter on the small-int
    * type column, pushed to the scan. */
  def p3TypeFilter(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .where(col("l_linenumber") === 2)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      .orderBy("l_orderkey", "l_partkey")

  /** P4: success filter (web_scraper.py:574-577). */
  def p4BoolFilter(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .withColumn("success", col("o_orderstatus") === "F")
      .where(col("success"))
      .select(col("o_orderkey"), col("o_orderstatus"))
      .orderBy("o_orderkey")

  /** P5: tagged-union normalization (web_scrpaer_2.py:124-145) — build the
    * exactly-one-non-null {moles|volume|mass} struct, then the when-chain
    * case analysis back to a wide (kind, value, units) row. */
  def p5TaggedUnion(s: SparkSession, d: String): DataFrame = {
    val amountStruct = struct(
      when(col("l_returnflag") === "R",
        struct(col("l_quantity").as("value"), lit("MOLE").as("units"))).as("moles"),
      when(col("l_returnflag") === "A",
        struct(col("l_quantity").as("value"), lit("LITER").as("units"))).as("volume"),
      when(!col("l_returnflag").isin("R", "A"),
        struct(col("l_quantity").as("value"), lit("GRAM").as("units"))).as("mass"))
    lineitem(s, d)
      .withColumn("amount", amountStruct)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        when(col("amount.moles").isNotNull, lit("moles"))
          .when(col("amount.volume").isNotNull, lit("volume"))
          .when(col("amount.mass").isNotNull, lit("mass"))
          .otherwise(lit("none")).as("amount_kind"),
        coalesce(col("amount.moles.value"), col("amount.volume.value"), col("amount.mass.value"))
          .as("amount_value"),
        coalesce(col("amount.moles.units"), col("amount.volume.units"), col("amount.mass.units"))
          .as("amount_units"))
      .orderBy("l_orderkey", "l_linenumber", "amount_kind", "amount_value")
  }

  /** P6: nested restructure (web_scrpaer_2.py:150-154) — wrap fields into a
    * named struct, then project them back out (restructure ∘ flatten = id). */
  def p6Restructure(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .select(
        col("c_custkey"),
        struct(
          col("c_name").as("name"),
          col("c_mktsegment").as("segment"),
          cents(col("c_acctbal")).as("acctbal_cents")).as("component"))
      .select(
        col("c_custkey"),
        col("component.name").as("name"),
        col("component.segment").as("segment"),
        col("component.acctbal_cents").as("acctbal_cents"))
      .orderBy("c_custkey")

  /** P7: default-on-missing (`.get(k, default)`, web_scrpaer_2.py:89-90,107). */
  def p7CoalesceDefaults(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(
        col("o_orderkey"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("UNKNOWN")).as("status"),
        coalesce(nullif(col("o_orderpriority"), lit("4-NOT SPECIFIED")), lit("0-DEFAULT")).as("priority"))
      .orderBy("o_orderkey")

  // ---------------------------------------------------------------- J1-J3

  /** J1: enum decode as a broadcast hash join (web_scrpaer_2.py:64-79 dicts
    * with 'UNKNOWN' default). The dim is a literal 5-row DataFrame,
    * `broadcast()`-hinted so the plan is BroadcastHashJoinExec at any scale
    * — never a shuffle. */
  def j1BroadcastDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dim = Seq(
      (1, "REACTANT"), (2, "REAGENT"), (3, "SOLVENT"),
      (4, "CATALYST"), (5, "INTERNAL_STANDARD")).toDF("code", "role_name")
    lineitem(s, d)
      .join(broadcast(dim), col("l_linenumber") === col("code"), "left")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        coalesce(col("role_name"), lit("UNKNOWN")).as("role"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** J1b: the map-literal fast path for the same enum decode (SURVEY
    * §2.9 X8) — `element_at(typedlit(map), code)` folds to a constant
    * lookup inside codegen, no join at all. The broadcast-join form (J1)
    * stays the declared general operator; this is the variant for
    * literal dictionaries on ultra-hot paths. */
  def j1bMapDecode(s: SparkSession, d: String): DataFrame = {
    val dict = typedLit(Map(
      1 -> "REACTANT", 2 -> "REAGENT", 3 -> "SOLVENT",
      4 -> "CATALYST", 5 -> "INTERNAL_STANDARD"))
    lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        coalesce(element_at(dict, col("l_linenumber")), lit("UNKNOWN")).as("role"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** J2: hierarchy reassembly — datasets ⋈ reactions then nest
    * (web_scrpaer_2.py:530-543). Equi-join + hash agg with map-side partial
    * aggregation; the nested list is sorted explicitly so the result is
    * order-deterministic (SURVEY §7.5.1). */
  def j2SmjReassemble(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        concat_ws(",",
          transform(array_sort(collect_list(col("o_orderkey"))), _.cast("string"))).as("order_ids"))
      .orderBy("c_custkey")

  /** J3: inputs↔outcomes self-join on the record key (SURVEY §2.3 J3). */
  def j3SelfJoin(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val a = li.where(col("l_linenumber") === 1)
      .select(col("l_orderkey"), col("l_partkey").as("part1"), col("l_quantity").as("qty1"))
    val b = li.where(col("l_linenumber") === 2)
      .select(col("l_orderkey"), col("l_partkey").as("part2"), col("l_quantity").as("qty2"))
    // (l_orderkey, l_linenumber) is not unique in the synthetic data, so
    // the join fans out — order by every column for a deterministic hash.
    a.join(b, "l_orderkey").orderBy("l_orderkey", "part1", "qty1", "part2", "qty2")
  }

  /** J3b: left-semi — records having a qualifying detail row. */
  def j3bSemi(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(
        lineitem(s, d).where(col("l_quantity") >= 48).select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_custkey"))
      .orderBy("o_orderkey")

  /** J3c: left-anti — records with no qualifying detail row (the "empty
    * dataset" case in ord_formatted_data_one.json). */
  def j3cAnti(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(
        lineitem(s, d).where(col("l_quantity") >= 48).select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select(col("o_orderkey"), col("o_custkey"))
      .orderBy("o_orderkey")

  // ---------------------------------------------------------------- F1-F5

  /** F1: posexplode of the assoc list (web_scraper.py:423-426) — order is
    * load-bearing, so the array is built sorted and exploded with position. */
  def f1PosexplodeTabs(s: SparkSession, d: String): DataFrame =
    lineitemByOrder(s, d)
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_list(struct(col("l_linenumber"), col("l_partkey")))).as("tabs"))
      .select(col("l_orderkey"), posexplode(col("tabs")).as(Seq("pos", "tab")))
      .select(
        col("l_orderkey"), col("pos"),
        col("tab.l_linenumber").as("l_linenumber"),
        col("tab.l_partkey").as("l_partkey"))
      .orderBy("l_orderkey", "pos")

  /** F2: components explode (web_scraper.py:429) — nest then flatten = id. */
  def f2ExplodeComponents(s: SparkSession, d: String): DataFrame =
    lineitemByOrder(s, d)
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_list(col("l_partkey"))).as("parts"))
      .select(col("l_orderkey"), explode(col("parts")).as("l_partkey"))
      .orderBy("l_orderkey", "l_partkey")

  /** F3: identifiers explode (web_scraper.py:432) — explode(split(...)). */
  def f3ExplodeIds(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(col("p_partkey"), explode(split(col("p_name"), " ")).as("word"))
      .orderBy("p_partkey", "word")

  /** F4: double flatten — outcomes × products (web_scraper.py:481-483):
    * two-level nesting rebuilt, then exploded twice. */
  def f4DoubleFlatten(s: SparkSession, d: String): DataFrame =
    lineitemByOrder(s, d)
      .groupBy(col("l_orderkey"), col("l_returnflag"))
      .agg(array_sort(collect_list(col("l_partkey"))).as("parts"))
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_list(struct(col("l_returnflag"), col("parts")))).as("groups"))
      .select(col("l_orderkey"), explode(col("groups")).as("g"))
      .select(col("l_orderkey"), col("g.l_returnflag").as("l_returnflag"),
        explode(col("g.parts")).as("l_partkey"))
      .orderBy("l_orderkey", "l_returnflag", "l_partkey")

  /** F5: explode_outer (web_scrpaer_2.py:169-182) — parents with empty
    * child arrays are retained with NULL. */
  def f5ExplodeOuter(s: SparkSession, d: String): DataFrame = {
    val big = lineitem(s, d)
      .where(col("l_quantity") >= 49)
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_list(col("l_partkey"))).as("parts"))
    orders(s, d)
      .join(big, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_orderkey"), explode_outer(col("parts")).as("big_part"))
      .orderBy(col("o_orderkey"), col("big_part").asc_nulls_first)
  }

  // ---------------------------------------------------------------- A1-A5

  /** A1: count per group (web_scrpaer_2.py:537). */
  def a1CountGroup(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** A2: conditional count (web_scraper.py:290). Money compared exactly. */
  def a2CondCount(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("o_totalprice") > 50000, 1).otherwise(0)).as("n_big"))
      .orderBy("o_orderstatus")

  /** A3: per-group + grand totals in one query via ROLLUP
    * (web_scraper.py:336-337). l_quantity is integral-valued double, so the
    * sum is exact and order-independent. */
  def a3RollupTotals(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity"))).cast("long").as("qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n"), col("qty"))
      .orderBy("flag", "status")

  /** A4: ordered collect_list nesting (web_scrpaer_2.py:541-543) — the
    * gathered list is explicitly sorted (array_agg ORDER BY semantics), not
    * arrival-ordered, so the result is deterministic under any shuffle. */
  def a4CollectList(s: SparkSession, d: String): DataFrame =
    lineitemByOrder(s, d)
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_items"),
        concat_ws(",",
          transform(array_sort(collect_list(col("l_linenumber"))), _.cast("string"))).as("lines"))
      .orderBy("l_orderkey")

  /** A5: regexp_extract + integer ceil-div page count
    * (web_scrpaer_2.py:234-241: `(n + 99) // 100`). */
  def a5RegexCeil(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("o_orderpriority"),
        regexp_extract(col("o_orderpriority"), "([0-9]+)", 1).cast("int").as("code"),
        col("n"),
        expr("(n + 99) div 100").as("pages"))
      .orderBy("o_orderpriority")

  // ---------------------------------------------------------------- D1-D2

  /** D1: first-seen dedup (web_scrpaer_2.py:262-263) — row_number over the
    * arrival key, keep rank 1. Hash-partitioned by the dedup key, so it
    * scales without a global sort. */
  def d1DedupFirstSeen(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    orders(s, d)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("first_order"))
      .orderBy("o_custkey")
  }

  /** D2: selector-fallback union (web_scraper.py:76-94) — candidate
    * extractions unioned with priority, first non-empty wins per key. */
  def d2UnionPriority(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = orders(s, d)
    val c1 = o.where(col("o_orderstatus") === "O")
      .select(col("o_custkey"), col("o_orderkey"), lit(1).as("prio"))
    val c2 = o.where(col("o_orderstatus") === "F")
      .select(col("o_custkey"), col("o_orderkey"), lit(2).as("prio"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("prio"), col("o_orderkey"))
    c1.unionByName(c2)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("picked"), col("prio"))
      .orderBy("o_custkey")
  }

  // ---------------------------------------------------------------- L1-L2

  /** L1: limit with a deterministic order key (web_scraper.py:324). */
  def l1Limit(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      .orderBy("o_orderkey")
      .limit(10)

  /** L2: 1-based end-inclusive range slice [101, 150]
    * (web_scrpaer_2.py:425-429) via Spark 3.4+ offset+limit. */
  def l2OffsetLimit(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"))
      .orderBy("o_orderkey")
      .offset(100)
      .limit(50)

  // ---------------------------------------------------------------- X1-X2

  /** X1: scalar string-function bundle (SURVEY §2.9 X1-X5, X9). */
  def x1StringFuncs(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .select(
        col("c_custkey"),
        element_at(split(col("c_name"), "#"), -1).as("name_id"),
        col("c_name").startsWith("Customer#").as("is_cust"),
        trim(concat(lit("  "), col("c_mktsegment"), lit(" "))).as("seg_trim"),
        regexp_extract(col("c_name"), "Customer#([0-9]+)", 1).as("digits"),
        concat(lit("cust-"), col("c_custkey").cast("string")).as("url_id"),
        substring(col("c_name"), 1, 10).as("name10"))
      .orderBy("c_custkey")

  /** X2: array-lambda bundle (web_scrpaer_2.py:310-311) —
    * split → transform(trim∘upper) → filter(non-empty) → join. */
  def x2ArrayFuncs(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(
        col("o_orderkey"),
        concat_ws("|",
          filter(
            transform(
              split(concat(col("o_orderpriority"), lit(","), col("o_orderstatus"), lit(", , extra")), ","),
              x => upper(trim(x))),
            x => length(x) > 0)).as("parts"))
      .orderBy("o_orderkey")
}
