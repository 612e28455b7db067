package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Source/sink operators (SURVEY.md §2.1 S4-S6): semi-structured decode,
  * validated read, nested-JSON sink. */
object SourceSink {

  /** Schema for the `events.props` JSON payload — always explicit, never
    * inferred, so types are pinned (reference: `json.loads`,
    * web_scraper.py:218). */
  val propsSchema: StructType = StructType(Seq(StructField("k", IntegerType)))

  /** S4: semi-structured decode — `from_json` with an explicit schema.
    * Codegen-friendly (JsonToStructs is a native expression); at scale the
    * event_id filter is pushed to the parquet scan before any JSON parsing. */
  def s4JsonDecode(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .where(col("event_id") < 1000)
      .select(
        col("event_id"),
        from_json(col("props"), propsSchema).getField("k").as("k"))
      .orderBy("event_id")

  /** S5: validated read (web_scraper.py:216-220) — constraint-check filter
    * with `observe()` metrics counting rejected rows (the engine-level
    * analogue of the reference's reject-and-log). The observation rides the
    * same pass over the data: no second scan. */
  def s5ValidatedRead(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .observe("s5_validation",
        count(when(col("value").isNull || col("value") < 0, 1)).as("n_rejected"))
      .where(col("value").isNotNull && col("value") >= 0)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_valid"))
      .orderBy("event_type")

  /** S7: CSV encode/decode round-trip — `to_csv` a projected struct and
    * `from_csv` it back with an explicit schema (the reference's tabular
    * interchange analogue of S4's JSON decode; its export surface is
    * line-oriented text, web_scraper.py:579-581). Both directions are
    * native Catalyst expressions (StructsToCsv / CsvToStructs), so the
    * whole op codegens and runs at scan bandwidth; the declared output
    * re-projects the decoded fields so the oracle checks the round trip
    * is lossless. Only exactly-representable types ride the CSV lane
    * (ints + strings) — floating-point interchange belongs to the
    * parquet sinks. */
  def s7CsvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val csvSchema = "l_orderkey BIGINT, l_linenumber INT, l_returnflag STRING, l_linestatus STRING"
    lineitem(s, d)
      .where(col("l_orderkey") < 100)
      .select(to_csv(struct(
        col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"), col("l_linestatus"))).as("line"))
      .select(from_csv(col("line"), StructType.fromDDL(csvSchema), Map.empty[String, String]).as("r"))
      .select(col("r.l_orderkey"), col("r.l_linenumber"),
        col("r.l_returnflag"), col("r.l_linestatus"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** S6: nested JSON sink (web_scraper.py:579-581) — re-nest detail rows
    * under their parent and render one JSON document per parent with
    * `to_json`. Declared without an oracle (file-format op); the driver
    * records a rows>0 check and the golden-file round-trip lives in tests.
    *
    * Scale note: this is one shuffle (the groupBy) and a streaming-friendly
    * projection; there is deliberately no coalesce(1) here — single-file
    * output is a test-only concern (VERDICT r1 §perf). */
  def s6JsonSink(s: SparkSession, d: String): DataFrame = {
    val nested = lineitem(s, d)
      .where(col("l_orderkey") < 100)
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_list(struct(
        col("l_linenumber"), col("l_partkey"), col("l_quantity")))).as("items"))
    orders(s, d)
      .where(col("o_orderkey") < 100)
      .join(nested, col("o_orderkey") === col("l_orderkey"), "left")
      .select(
        col("o_orderkey"),
        to_json(struct(
          col("o_orderkey").as("order_id"),
          col("o_orderstatus").as("status"),
          coalesce(col("items"), array()).as("items"))).as("doc"))
      .orderBy("o_orderkey")
  }
}
