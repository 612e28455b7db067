package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ord.{OrdFixtures, OrdPipeline}

/** The raw (unformatted-inclusive) sink — the reference's EP3
  * `reaction_database_scrape.json`. No golden file exists for this
  * output in the reference, so the contract is structural: every
  * envelope parses as JSON, counts agree with the reaction list, empty
  * datasets keep empty lists, and every embedded payload round-trips
  * bit-exactly against the raw fixture. */
class OrdRawSinkSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  test("every raw envelope parses, counts agree, payloads round-trip") {
    val rows = OrdPipeline.ordS6bRawSink(spark, SparkTestSession.sf).collect()
    val (_, raws) = OrdFixtures.parseAll()
    val rawByKey = raws.map(r => (r.file, r.dataset_id, r.reaction_id) -> r.raw).toMap
    assert(rows.nonEmpty)
    var withPayloads = 0
    var empties = 0
    rows.foreach { row =>
      val file = row.getString(0)
      val dsId = row.getString(1)
      val doc = mapper.readTree(row.getString(2))
      assert(doc.get("dataset_id").asText() == dsId)
      val rx = doc.get("reactions")
      assert(doc.get("total_reactions").asInt() == rx.size())
      assert(doc.get("success").asBoolean() == (rx.size() > 0))
      if (rx.size() == 0) empties += 1
      (0 until rx.size()).foreach { i =>
        val r = rx.get(i)
        val orig = rawByKey((file, dsId, r.get("reaction_id").asText()))
        // verbatim payload: parse both and compare trees (the sink
        // stores the payload as a string field)
        assert(mapper.readTree(r.get("data").asText()) == mapper.readTree(orig),
          s"payload mismatch for ${r.get("reaction_id").asText()}")
        withPayloads += 1
      }
    }
    assert(withPayloads > 100, s"expected substantial payload coverage, got $withPayloads")
    // the golden corpus ships 4 empty datasets (ord_formatted_data_one)
    assert(empties >= 4, s"empty-dataset envelopes must survive, got $empties")
  }
}
