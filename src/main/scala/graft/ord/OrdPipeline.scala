package graft.ord

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queries over the ORD golden-data fixtures (SURVEY.md §7.2 M1/M3).
  *
  * These re-express the reference's formatted-data dataflow
  * (`/root/reference/web_scrpaer_2.py:82-192`, `web_scraper.py:410-504`)
  * as Spark plans over the nested fixture parquet: posexplode of the
  * order-bearing `inputsMap` assoc list, component/identifier flattens,
  * tagged-union amount analysis, enum dim joins (broadcast — the dims are
  * 5-11 rows), per-dataset aggregation, and the envelope self-check
  * (`total_reactions_scraped` vs actual reaction count).
  *
  * Every query starts with `OrdFixtures.ensure` (idempotent, one-time
  * driver-side conversion of ≤650 KB of JSON) and then stays fully
  * distributed. Ordering: all outputs carry a total ORDER BY so the
  * driver's hash compare is deterministic.
  */
object OrdPipeline {

  /** Enum decode dimensions (web_scraper.py:9-21, web_scrpaer_2.py:63-79).
    * Tiny literal dims — always broadcast, never shuffled. */
  def roleDim(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(0 -> "UNSPECIFIED", 1 -> "REACTANT", 2 -> "REAGENT", 3 -> "SOLVENT",
      4 -> "CATALYST", 5 -> "WORKUP", 6 -> "INTERNAL_STANDARD",
      7 -> "AUTHENTIC_STANDARD", 8 -> "PRODUCT", 9 -> "BYPRODUCT",
      10 -> "SIDE_PRODUCT").toDF("role_code", "role_name")
  }

  private def nested(s: SparkSession): DataFrame = {
    OrdFixtures.ensure(s)
    s.read.parquet(OrdFixtures.nestedPath)
  }

  private def raw(s: SparkSession): DataFrame = {
    OrdFixtures.ensure(s)
    s.read.parquet(OrdFixtures.rawPath)
  }

  /** dataset → one row per reaction (keeps stored rx order). */
  private def reactions(s: SparkSession): DataFrame =
    nested(s).select(
      col("file"), col("dataset_id"), explode(col("reactions")).as("rx"))

  /** reaction → one row per inputsMap tab, position-preserving (F1). */
  private def tabs(s: SparkSession): DataFrame =
    reactions(s).select(
      col("file"), col("dataset_id"), col("rx.reaction_id").as("reaction_id"),
      posexplode(col("rx.inputsMap")).as(Seq("tab_pos", "tab")))

  /** tab → one row per component with the wide amount form (F2+P5). */
  private def components(s: SparkSession): DataFrame =
    tabs(s).select(
      col("file"), col("dataset_id"), col("reaction_id"), col("tab_pos"),
      col("tab.tab_name").as("tab_name"), explode(col("tab.components")).as("c"))
      .select(
        col("file"), col("dataset_id"), col("reaction_id"), col("tab_pos"),
        col("tab_name"), col("c.comp_pos").as("comp_pos"),
        col("c.amount_kind").as("amount_kind"),
        col("c.amount_value").as("amount_value"),
        col("c.amount_units").as("amount_units"),
        col("c.reaction_role").as("reaction_role"),
        col("c.identifiers").as("identifiers"))

  // ------------------------------------------------------------- queries

  /** Envelope self-check (flagship core): dataset-level counts vs the
    * envelope's own total_reactions_scraped (web_scrpaer_2.py:530-543). */
  def ordEnvelopeCheck(s: SparkSession, d: String): DataFrame =
    nested(s).select(
      col("file"), col("dataset_id"), col("total_reactions_scraped"),
      size(col("reactions")).as("n_rx"),
      size(filter(col("reactions"), r => r.getField("success"))).as("n_success"),
      (col("total_reactions_scraped") === size(col("reactions"))).as("env_match"))
      .orderBy("file", "dataset_id")

  /** F1 over ORD: posexplode the assoc list — order is load-bearing
    * (web_scraper.py:471-477). */
  def ordF1Tabs(s: SparkSession, d: String): DataFrame =
    tabs(s).select(
      col("file"), col("dataset_id"), col("reaction_id"), col("tab_pos"),
      col("tab.tab_name").as("tab_name"),
      size(col("tab.components")).as("n_components"))
      .orderBy("file", "dataset_id", "reaction_id", "tab_pos")

  /** P5+P6 over ORD: component-level wide rows with the tagged-union
    * amount normalized (web_scrpaer_2.py:124-145). */
  def ordComponents(s: SparkSession, d: String): DataFrame =
    components(s).drop("identifiers")
      .orderBy("file", "dataset_id", "reaction_id", "tab_pos", "comp_pos")

  /** F3+A1 over ORD: identifier explode + type histogram
    * (web_scrpaer_2.py:104-113). */
  def ordIdTypes(s: SparkSession, d: String): DataFrame =
    components(s)
      .select(col("file"), explode(col("identifiers")).as("id"))
      .groupBy(col("file"), col("id.id_type").as("id_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("file", "id_type")

  /** A1 over ORD: reaction-role histogram per file — matches the profiled
    * counts in FIXTURES.md (REACTANT 705, SOLVENT 281, ... for _one). */
  def ordRolesHistogram(s: SparkSession, d: String): DataFrame =
    components(s)
      .groupBy(col("file"), col("reaction_role"))
      .agg(count(lit(1)).as("n"))
      .orderBy("file", "reaction_role")

  /** J1 over ORD: role string ⋈ broadcast enum dim (reverse decode, code
    * -1 on miss) — BroadcastHashJoinExec at any scale. */
  def ordJ1RoleEncode(s: SparkSession, d: String): DataFrame =
    components(s)
      .join(broadcast(roleDim(s)), col("reaction_role") === col("role_name"), "left")
      .groupBy(col("file"), col("reaction_role"),
        coalesce(col("role_code"), lit(-1)).as("role_code"))
      .agg(count(lit(1)).as("n"))
      .orderBy("file", "reaction_role")

  /** A3 over ORD: amount-kind/unit stats; sum rounded to 9 decimals so
    * the float64 totals hash-match across summation orders (SURVEY §7.5.1). */
  def ordAmountStats(s: SparkSession, d: String): DataFrame =
    components(s)
      .groupBy(col("file"), col("amount_kind"), col("amount_units"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("amount_value")), 9).as("total_value"))
      .orderBy("file", "amount_kind", "amount_units")

  /** F4+F5 over ORD: outcomes double-flatten with measurements
    * explode_outer (v1 rows keep NULL measurement columns;
    * web_scrpaer_2.py:161-189). */
  def ordF5Measurements(s: SparkSession, d: String): DataFrame =
    reactions(s)
      .select(col("file"), col("dataset_id"),
        col("rx.reaction_id").as("reaction_id"), explode(col("rx.outcomes")).as("o"))
      .select(col("file"), col("dataset_id"), col("reaction_id"),
        col("o.out_pos").as("out_pos"),
        col("o.reaction_role").as("out_role"),
        col("o.is_desired_product").as("is_desired_product"),
        posexplode_outer(col("o.measurements")).as(Seq("m_pos", "m")))
      .select(col("file"), col("dataset_id"), col("reaction_id"), col("out_pos"),
        col("out_role"), col("is_desired_product"), col("m_pos"),
        col("m.m_type").as("m_type"), col("m.details").as("details"),
        col("m.mass_value").as("mass_value"), col("m.mass_units").as("mass_units"))
      .orderBy(col("file"), col("dataset_id"), col("reaction_id"), col("out_pos"),
        col("m_pos").asc_nulls_first)

  /** S4+S5 over ORD: from_json-style decode of the raw reaction JSON with
    * the reference's id-match validation (web_scraper.py:216-220). */
  def ordS4Decode(s: SparkSession, d: String): DataFrame =
    raw(s).select(
      col("file"), col("dataset_id"), col("reaction_id"),
      get_json_object(col("raw"), "$.reaction_id").as("parsed_id"),
      get_json_object(col("raw"), "$.success").cast("boolean").as("parsed_success"),
      (get_json_object(col("raw"), "$.reaction_id") === col("reaction_id")).as("id_match"),
      // deep path into the heterogeneous assoc list: [0][0] is the first
      // tab's name (web_scraper.py:471-477)
      get_json_object(col("raw"), "$.inputsMap[0][0]").as("first_tab"),
      json_array_length(get_json_object(col("raw"), "$.inputsMap")).as("n_tabs"),
      json_array_length(get_json_object(col("raw"), "$.outcomes")).as("n_outcomes"))
      .orderBy("file", "dataset_id", "reaction_id")

  /** A4 over ORD: re-nest reactions under their dataset envelope with an
    * explicit ORDER BY inside the gathered list (array_agg ORDER BY
    * semantics — web_scrpaer_2.py:541-543). */
  def ordA4Renest(s: SparkSession, d: String): DataFrame =
    reactions(s)
      .groupBy(col("file"), col("dataset_id"))
      .agg(
        count(lit(1)).as("n_rx"),
        concat_ws(",", array_sort(collect_list(col("rx.reaction_id")))).as("rx_ids"))
      .orderBy("file", "dataset_id")

  /** The v1↔v2 normalizer duality (SURVEY §7.5.3) as a query: apply the
    * v1 pipeline's rules to the v2-shaped file — SMILES-only identifier
    * filter (web_scraper.py:433,487), hardcoded MOLE/LITER units
    * (web_scraper.py:447,455), mass branch dropped (absent in v1) —
    * yielding the row the v1 formatter would have produced. */
  def ordV1Downgrade(s: SparkSession, d: String): DataFrame =
    components(s)
      .where(col("file") === "ord_formatted_data.json")
      .select(
        col("dataset_id"), col("reaction_id"), col("tab_pos"), col("comp_pos"),
        size(filter(col("identifiers"), id => id.getField("id_type") === "SMILES"))
          .as("n_smiles_ids"),
        when(col("amount_kind") === "mass", lit("none")).otherwise(col("amount_kind"))
          .as("v1_kind"),
        when(col("amount_kind") === "moles", lit("MOLE"))
          .when(col("amount_kind") === "volume", lit("LITER"))
          .as("v1_units"),
        col("reaction_role"))
      .orderBy("dataset_id", "reaction_id", "tab_pos", "comp_pos")

  /** The v1-units BUG as evidence (SURVEY §1.3): v1 hardcodes MOLE for
    * every moles amount and LITER for every volume amount
    * (web_scraper.py:447,455), while v2 decodes the actual unit enum
    * (web_scrpaer_2.py:124-145) — so real GRAM/MILLILITER/MILLIGRAM data
    * silently mislabels under v1. Per (file, kind, v2 unit): how many
    * components v1's hardcoding would have mislabeled. */
  def ordUnitsDiverge(s: SparkSession, d: String): DataFrame =
    components(s)
      .where(col("amount_kind").isin("moles", "volume"))
      .select(col("file"), col("amount_kind"),
        when(col("amount_kind") === "moles", lit("MOLE"))
          .otherwise(lit("LITER")).as("v1_units"),
        col("amount_units").as("v2_units"))
      .groupBy("file", "amount_kind", "v1_units", "v2_units")
      .agg(count(lit(1)).as("n"))
      .withColumn("diverges", col("v1_units") =!= col("v2_units"))
      .orderBy("file", "amount_kind", "v2_units")

  /** S6 over ORD: the reference's primary sink — each dataset envelope
    * rendered as one nested JSON document (`json.dump`,
    * web_scrpaer_2.py:545-548). `to_json` drops null fields, matching
    * the reference's omit-rather-than-null convention (SURVEY §1.5).
    * Declared without an oracle (file-format op): the driver records a
    * rows>0 check; parse-back fidelity is covered in OrdGoldenSpec. */
  def ordS6Sink(s: SparkSession, d: String): DataFrame =
    nested(s).select(
      col("file"), col("dataset_id"),
      to_json(struct(
        col("dataset_id"), col("total_reactions_scraped"), col("reactions")))
        .as("doc"))
      .orderBy("file", "dataset_id")

  /** S6b: the RAW (unformatted-inclusive) sink — the reference's EP3
    * `reaction_database_scrape.json` (`web_scraper.py:349-352`): one
    * envelope per dataset with the reference's exact field set
    * (`web_scraper.py:294-307`): `{dataset_id, reactions,
    * total_reactions, successful_scrapes}`, plus
    * `error: "No reactions found"` for an empty dataset
    * (`web_scraper.py:271-276`). Each reaction entry mirrors
    * `scrape_reaction_data`'s result dict: success →
    * `{reaction_id, data, success: true, formatted_data}`
    * (`web_scraper.py:228-232,283-285`); failure → `{reaction_id,
    * data: null, success: false, error: "Max retries exceeded"}`
    * (`web_scraper.py:248-253`). `data` is spliced VERBATIM as a JSON
    * object (not a quoted string): the document is rendered textually
    * because the payload is already compact JSON.
    *
    * One documented deviation remains — data availability, not schema:
    * the reference's `data` is the full scraped modal JSON and
    * `formatted_data` the extracted subset (`web_scraper.py:410-504`),
    * but the golden corpus preserves only the formatted form, so the
    * sink embeds the same payload for both fields. No golden file
    * exists for this output (rows-only check, like s6); OrdRawSinkSpec
    * proves every envelope parses, counts/flags/error fields match the
    * reference contract, and payloads round-trip bit-exactly against
    * the raw fixture. Reactions nest in stored scrape order (rx_pos),
    * so the document is deterministic. */
  def ordS6bRawSink(s: SparkSession, d: String): DataFrame = {
    val n = nested(s)
    val rx = n
      .select(col("file"), col("dataset_id"), explode(col("reactions")).as("r"))
      .select(col("file"), col("dataset_id"),
        col("r.rx_pos").as("rx_pos"),
        col("r.reaction_id").as("reaction_id"), col("r.success").as("success"))
    val rawPayloads = raw(s)
      .select(col("file"), col("dataset_id"), col("reaction_id"), col("raw"))
    renderRawEnvelopes(n.select(col("file"), col("dataset_id")), rx, rawPayloads)
  }

  /** The raw-envelope render core, separated so the failure branch
    * (`success = false` → data: null + error, no formatted_data) is
    * testable: the golden corpus contains only successful reactions, so
    * OrdRawSinkSpec drives this with a synthetic fixture to cover the
    * path the reference takes on a scrape failure
    * (`web_scraper.py:248-253`).
    *
    * Inputs: `datasets` = (file, dataset_id) — one row per dataset,
    * empty ones included; `rx` = (file, dataset_id, rx_pos, reaction_id,
    * success); `raw` = (file, dataset_id, reaction_id, raw-JSON-string).
    */
  private[graft] def renderRawEnvelopes(
      datasets: DataFrame, rx: DataFrame, raw: DataFrame): DataFrame = {
    // JSON string literal (ids are control-char-free; escape " and \)
    def jstr(c: Column): Column =
      concat(lit("\""), regexp_replace(c, "([\"\\\\])", "\\\\$1"), lit("\""))
    val rxDoc = when(col("success"),
        concat(lit("{\"reaction_id\": "), jstr(col("reaction_id")),
          lit(", \"data\": "), col("raw"),
          lit(", \"success\": true, \"formatted_data\": "), col("raw"),
          lit("}")))
      .otherwise(
        concat(lit("{\"reaction_id\": "), jstr(col("reaction_id")),
          lit(", \"data\": null, \"success\": false, " +
            "\"error\": \"Max retries exceeded\"}")))
    val agged = rx.join(raw, Seq("file", "dataset_id", "reaction_id"), "left")
      .select(col("file"), col("dataset_id"), col("rx_pos"), col("success"),
        rxDoc.as("doc"))
      // a SUCCESS row with no raw payload renders a null doc (broken
      // input — the reference cannot produce that state); drop it here
      // so counts and the reactions array stay consistent with each
      // other, instead of counting a row the array doesn't carry
      .where(col("doc").isNotNull)
      .groupBy(col("file"), col("dataset_id"))
      .agg(sort_array(collect_list(struct(
        col("rx_pos"), col("success"), col("doc")))).as("rs"))
    datasets
      .join(agged, Seq("file", "dataset_id"), "left")
      .select(col("file"), col("dataset_id"),
        concat(
          lit("{\"dataset_id\": "), jstr(col("dataset_id")),
          lit(", \"reactions\": ["),
          when(col("rs").isNotNull,
            array_join(transform(col("rs"), r => r.getField("doc")), ", "))
            .otherwise(lit("")),
          lit("], \"total_reactions\": "),
          coalesce(size(col("rs")), lit(0)).cast("string"),
          lit(", \"successful_scrapes\": "),
          coalesce(size(filter(col("rs"), r => r.getField("success"))), lit(0))
            .cast("string"),
          when(coalesce(size(col("rs")), lit(0)) === 0,
            lit(", \"error\": \"No reactions found\"")).otherwise(lit("")),
          lit("}")).as("doc"))
      .orderBy("file", "dataset_id")
  }

  /** Flagship (SparkEntry.entry, SURVEY §7.3 M1): golden JSON → explodes
    * → amount union → per-dataset agg → envelope check. Exercises scan,
    * explode ×3, case analysis, aggregation in one plan. */
  def flagship(s: SparkSession): DataFrame = {
    val comps = components(s)
    val perDataset = comps.groupBy(col("file"), col("dataset_id"))
      .agg(
        countDistinct(col("reaction_id")).as("n_rx_with_inputs"),
        count(lit(1)).as("n_components"),
        sum(when(col("amount_kind") === "moles", 1).otherwise(0)).as("n_moles"),
        sum(when(col("amount_kind") === "volume", 1).otherwise(0)).as("n_volume"),
        sum(when(col("amount_kind") === "mass", 1).otherwise(0)).as("n_mass"))
    nested(s)
      .select(col("file"), col("dataset_id"), col("total_reactions_scraped"),
        size(col("reactions")).as("n_rx"))
      .join(perDataset, Seq("file", "dataset_id"), "left")
      .withColumn("env_match", col("total_reactions_scraped") === col("n_rx"))
      .orderBy("file", "dataset_id")
  }
}
