package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ord.{OrdFixtures, OrdPipeline}

/** The raw (unformatted-inclusive) sink — the reference's EP3
  * `reaction_database_scrape.json`. No golden file exists for this
  * output in the reference, so the contract is structural against the
  * envelope code (`web_scraper.py:294-307,248-253,271-276`): the exact
  * reference field set (`successful_scrapes` count, `error` markers,
  * `formatted_data` only on success), `data` embedded as a JSON
  * OBJECT (not a quoted string) that round-trips bit-exactly against
  * the raw fixture, and empty datasets keeping empty lists. */
class OrdRawSinkSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  test("raw envelopes match the reference EP3 field set and payloads round-trip") {
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
      // reference envelope: counts, not a boolean status field
      assert(doc.get("total_reactions").asInt() == rx.size())
      assert(!doc.has("success"), "dataset envelope has no success field in the reference")
      val successful = (0 until rx.size()).count(i => rx.get(i).get("success").asBoolean())
      assert(doc.get("successful_scrapes").asInt() == successful)
      if (rx.size() == 0) {
        empties += 1
        // web_scraper.py:271-276: empty dataset carries an error marker
        assert(doc.get("error").asText() == "No reactions found")
      } else {
        assert(!doc.has("error"))
      }
      (0 until rx.size()).foreach { i =>
        val r = rx.get(i)
        val orig = mapper.readTree(rawByKey((file, dsId, r.get("reaction_id").asText())))
        if (r.get("success").asBoolean()) {
          // success result dict: data is the parsed JSON OBJECT, spliced
          // verbatim, plus formatted_data (web_scraper.py:228-232,283-285)
          assert(r.get("data").isObject, "data must be an embedded object, not a string")
          assert(r.get("data") == orig, s"payload mismatch for ${r.get("reaction_id").asText()}")
          assert(r.get("formatted_data") == orig)
          assert(!r.has("error"))
        } else {
          // failure result dict (web_scraper.py:248-253)
          assert(r.get("data").isNull)
          assert(r.get("error").asText() == "Max retries exceeded")
          assert(!r.has("formatted_data"))
        }
        withPayloads += 1
      }
    }
    assert(withPayloads > 100, s"expected substantial payload coverage, got $withPayloads")
    // the golden corpus ships 4 empty datasets (ord_formatted_data_one)
    assert(empties >= 4, s"empty-dataset envelopes must survive, got $empties")
  }

  test("failure branch: failed reactions render data:null + error and survive the join") {
    // the golden corpus has no success=false reactions, so the failure
    // render path (web_scraper.py:248-253) is driven synthetically: one
    // dataset with a success followed by a failure (no raw payload row —
    // the reference has none for a failed scrape), plus an empty dataset
    import spark.implicits._
    val datasets = Seq(("f", "ds1"), ("f", "ds_empty")).toDF("file", "dataset_id")
    val rx = Seq(
      ("f", "ds1", 0, "ord-ok", true),
      ("f", "ds1", 1, "ord-fail", false),
      // broken input: claims success but has no raw payload row — must
      // be dropped from BOTH the counts and the array (consistency),
      // never counted-but-absent
      ("f", "ds1", 2, "ord-broken", true))
      .toDF("file", "dataset_id", "rx_pos", "reaction_id", "success")
    val raw = Seq(("f", "ds1", "ord-ok", """{"reactionId": "ord-ok"}"""))
      .toDF("file", "dataset_id", "reaction_id", "raw")
    val docs = graft.ord.OrdPipeline.renderRawEnvelopes(datasets, rx, raw)
      .collect().map(r => r.getString(1) -> mapper.readTree(r.getString(2))).toMap
    val d1 = docs("ds1")
    assert(d1.get("total_reactions").asInt() == 2)
    assert(d1.get("successful_scrapes").asInt() == 1)
    assert(d1.get("reactions").size() == 2)
    assert(!d1.has("error"))
    val ok = d1.get("reactions").get(0)
    assert(ok.get("success").asBoolean() && ok.get("data").isObject
      && ok.get("formatted_data").isObject && !ok.has("error"))
    val fail = d1.get("reactions").get(1)
    assert(fail.get("reaction_id").asText() == "ord-fail")
    assert(!fail.get("success").asBoolean())
    assert(fail.get("data").isNull, "failed reaction must carry data: null")
    assert(fail.get("error").asText() == "Max retries exceeded")
    assert(!fail.has("formatted_data"))
    val de = docs("ds_empty")
    assert(de.get("total_reactions").asInt() == 0)
    assert(de.get("successful_scrapes").asInt() == 0)
    assert(de.get("reactions").size() == 0)
    assert(de.get("error").asText() == "No reactions found")
  }
}
