package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Cross-document chunk dedup (q104's operator): planted boilerplate is
  * kept exactly once at its first occurrence; unique content is fully
  * retained; totals reconcile. */
class ChunkDedupSpec extends SparkSuite {
  import spark.implicits._

  // 4-token chunks; docs share the boilerplate prefix "the data the data"
  private val boiler = "the data the data"
  private val docs = Seq(
    (1L, s"$boiler alpha beta gamma delta"),
    (2L, s"$boiler epsilon zeta eta theta"),
    (3L, "iota kappa lambda mu")).toDF("doc_id", "text")

  test("boilerplate chunk kept once, at the first (doc_id, chunk_idx)") {
    val got = Dedup.crossDocChunkDedup(docs, "doc_id", "text", chunkSize = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1: 2 chunks, both kept (owns the boilerplate)
    assert(got(1L) == ((2L, 2L, 8L)), got.toString)
    // doc 2: 2 chunks, boilerplate chunk dropped
    assert(got(2L) == ((2L, 1L, 4L)), got.toString)
    // doc 3: unique content fully retained
    assert(got(3L) == ((1L, 1L, 4L)), got.toString)
  }

  test("every distinct chunk hash is kept exactly once corpus-wide") {
    val acc = Dedup.crossDocChunkDedup(docs, "doc_id", "text", chunkSize = 4)
    val keptTotal = acc.agg(sum("n_kept")).head.getLong(0)
    val distinctHashes = graft.operators.TextAnalysis
      .chunkTokens(docs, "doc_id", "text", 4, 4)
      .select("chunk_hash").distinct().count()
    assert(keptTotal == distinctHashes)
  }

  test("boilerplateStrip removes a high-df chunk EVERYWHERE (vs keep-first)") {
    val got = Dedup.boilerplateStrip(docs, "doc_id", "text", chunkSize = 4, maxDf = 1L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // boilerplate chunk (df=2) dropped from BOTH docs 1 and 2 — no owner
    assert(got(1L) == ((2L, 1L, 4L)), got.toString)
    assert(got(2L) == ((2L, 1L, 4L)), got.toString)
    // unique content untouched
    assert(got(3L) == ((1L, 1L, 4L)), got.toString)
  }

  test("boilerplateStrip maxDf at or above the max df keeps everything") {
    val got = Dedup.boilerplateStrip(docs, "doc_id", "text", chunkSize = 4, maxDf = 2L)
      .agg(sum("n_chunks"), sum("n_kept")).head
    assert(got.getLong(0) == got.getLong(1))
  }
}
