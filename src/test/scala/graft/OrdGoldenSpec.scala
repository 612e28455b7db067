package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ord.{OrdFixtures, OrdPipeline}

/** Golden-file tests against the reference's five checked-in outputs
  * (profiled in FIXTURES.md / SURVEY.md §0-1). These pin the invariants
  * a correct re-implementation of the reference's formatter must
  * reproduce. */
class OrdGoldenSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("fixture inventory: 55 datasets across 5 files; _one has 50 with 4 empty") {
    val env = run("ord_envelope_check").collect()
    assert(env.length == 55)
    val one = env.filter(_.getString(0) == "ord_formatted_data_one.json")
    assert(one.length == 50)
    assert(one.count(_.getAs[Int]("n_rx") == 0) == 4)
    // every envelope's own count matches the actual reaction count
    assert(env.forall(_.getAs[Boolean]("env_match")))
  }

  test("_one holds 230 reactions; total corpus 237") {
    val renest = run("ord_a4_renest")
    val one = renest.where(col("file") === "ord_formatted_data_one.json")
      .agg(sum("n_rx")).collect()(0).getLong(0)
    assert(one == 230)
    assert(renest.agg(sum("n_rx")).collect()(0).getLong(0) == 237)
  }

  test("role histogram of _one matches the profile (REACTANT 705, SOLVENT 281, ...)") {
    val hist = run("ord_roles_histogram")
      .where(col("file") === "ord_formatted_data_one.json")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(hist == Map(
      "REACTANT" -> 705L, "SOLVENT" -> 281L, "CATALYST" -> 68L,
      "REAGENT" -> 15L, "UNSPECIFIED" -> 5L, "INTERNAL_STANDARD" -> 5L))
  }

  test("v1 files carry only SMILES identifiers; v2 adds NAME/INCHI") {
    val types = run("ord_id_types").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val v1Types = types.filter(_._1 != "ord_formatted_data.json").map(_._2)
    assert(v1Types == Set("SMILES"),
      s"v1 should be SMILES-only (web_scraper.py:433,487) but got $v1Types")
    val v2Types = types.filter(_._1 == "ord_formatted_data.json").map(_._2)
    assert(v2Types.contains("NAME") && v2Types.contains("SMILES"))
  }

  test("v1 hardcodes MOLE/LITER units; v2 decodes GRAM/MILLILITER/MILLIGRAM") {
    val stats = run("ord_amount_stats").collect()
      .map(r => (r.getString(0), Option(r.getString(2)))).toSet
    val v1Units = stats.filter(_._1 != "ord_formatted_data.json").flatMap(_._2)
    assert(v1Units == Set("MOLE", "LITER"),
      "v1 units are hardcoded (web_scraper.py:447,455)")
    val v2Units = stats.filter(_._1 == "ord_formatted_data.json").flatMap(_._2)
    assert(v2Units == Set("MOLE", "MILLILITER", "GRAM"))
  }

  test("assoc-list order is preserved: first reaction's tabs in insertion order") {
    val tabs = run("ord_f1_tabs")
      .where(col("file") === "ord_formatted_data_single.json")
      .orderBy("tab_pos")
      .collect().map(_.getString(4))
    assert(tabs.toSeq == Seq("Base", "Solvent", "amine", "aryl halide", "metal and ligand"),
      "posexplode must preserve the JSON assoc-list order (web_scraper.py:471-477)")
  }

  test("vestigial outcome amount appears in v1 only; measurements in v2 only") {
    OrdFixtures.ensure(spark)
    val outcomes = spark.read.parquet(OrdFixtures.nestedPath)
      .select(col("file"), explode(col("reactions")).as("rx"))
      .select(col("file"), explode(col("rx.outcomes")).as("o"))
    val vestigial = outcomes.where(col("o.has_vestigial_amount"))
      .select("file").distinct().collect().map(_.getString(0)).toSet
    assert(vestigial.contains("ord_formatted_data_single.json"))
    assert(!vestigial.contains("ord_formatted_data.json"))
    val withMeas = run("ord_f5_measurements").where(col("m_type").isNotNull)
    assert(withMeas.select("file").distinct().collect()
      .map(_.getString(0)).toSet == Set("ord_formatted_data.json"))
    // v2 keeps the raw int measurement code undecoded (web_scrpaer_2.py:172)
    assert(withMeas.where(col("m_type") === 9).count() > 0)
  }

  test("S4 decode: every raw reaction re-parses and id-matches (web_scraper.py:219-220)") {
    val dec = run("ord_s4_decode")
    assert(dec.count() == 237)
    assert(dec.where(!col("id_match")).count() == 0)
    assert(dec.where(!col("parsed_success")).count() == 0)
  }

  test("S6 sink: every dataset document parses back with its reaction count intact") {
    import org.apache.spark.sql.types._
    OrdFixtures.ensure(spark)
    val nestedSchema = spark.read.parquet(OrdFixtures.nestedPath).schema
    val docSchema = StructType(Seq(
      nestedSchema("dataset_id"), nestedSchema("total_reactions_scraped"),
      nestedSchema("reactions")))
    val sink = run("ord_s6_sink")
    val back = sink.withColumn("p", from_json(col("doc"), docSchema))
    assert(back.where(col("p").isNull).count() == 0)
    assert(back.where(col("p.dataset_id") =!= col("dataset_id")).count() == 0)
    // to_json ∘ from_json preserves the reaction array cardinality
    assert(back
      .where(size(col("p.reactions")) =!= col("p.total_reactions_scraped"))
      .count() == 0)
  }

  test("v1 downgrade applies the v1 rules to the v2 file") {
    val dg = run("ord_v1_downgrade").collect()
    assert(dg.length == 7) // the v2 reaction has 7 components
    // mass components lose their amount (v1 has no mass branch)
    assert(dg.count(_.getAs[String]("v1_kind") == "none") >= 1)
    // surviving kinds carry only the v1 hardcoded units
    val units = dg.flatMap(r => Option(r.getAs[String]("v1_units"))).toSet
    assert(units.subsetOf(Set("MOLE", "LITER")))
  }

  test("explode ∘ nest = id: renest counts equal envelope counts") {
    val renest = run("ord_a4_renest").select("file", "dataset_id", "n_rx")
    val env = run("ord_envelope_check").where(col("n_rx") > 0)
      .select(col("file"), col("dataset_id"), col("n_rx").cast("long").as("n_rx"))
    assert(renest.exceptAll(env).count() == 0)
    assert(env.exceptAll(renest).count() == 0)
  }
}
