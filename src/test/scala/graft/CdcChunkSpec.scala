package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Content-defined chunking (q144's operator): the shift-invariance
  * property that justifies CDC over a fixed grid, plus boundary
  * mechanics. */
class CdcChunkSpec extends SparkSuite {
  import spark.implicits._

  // a deterministic 240-word document with all-distinct windows;
  // letter-only words (normalization strips digits)
  private val words = (0 until 240).map(i =>
    s"w${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
  private val original = words.mkString(" ")
  private val shifted = "inserted " + original // one word prepended

  private def hashes(text: String): Seq[String] = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    Dedup.cdcChunks(df, "doc_id", "text").select("chunk_hash")
      .as[String].collect().toSeq
  }

  private def fixedHashes(text: String): Seq[String] = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    graft.operators.TextAnalysis.chunkTokens(df, "doc_id", "text", 16, 16)
      .select("chunk_hash").as[String].collect().toSeq
  }

  test("insertion invalidates one CDC chunk but every fixed-grid chunk") {
    val a = hashes(original); val b = hashes(shifted)
    assert(a.size >= 4, s"need several chunks for the contrast, got ${a.size}")
    val cdcShared = a.toSet.intersect(b.toSet).size.toDouble / a.size
    val fa = fixedHashes(original); val fb = fixedHashes(shifted)
    val fixedShared = fa.toSet.intersect(fb.toSet).size.toDouble / fa.size
    // CDC: all chunks after the edited one survive; fixed grid: the
    // one-word shift changes every chunk
    assert(cdcShared >= (a.size - 1).toDouble / a.size - 1e-9,
      s"cdc shared=$cdcShared of ${a.size}")
    assert(fixedShared == 0.0, s"fixed grid shared=$fixedShared")
  }

  test("chunks tile the document: token counts sum to the word count") {
    val df = Seq((1L, original)).toDF("doc_id", "text")
    val total = Dedup.cdcChunks(df, "doc_id", "text")
      .agg(sum("chunk_tok")).head.getLong(0)
    assert(total == words.size.toLong, s"$total vs ${words.size}")
    // chunk indices are contiguous from 0
    val idx = Dedup.cdcChunks(df, "doc_id", "text")
      .select("chunk_idx").as[Int].collect().sorted
    assert(idx.toSeq == (0 until idx.length).toSeq)
  }

  test("wordless and null docs produce no chunks") {
    val df = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "!!! ???"))
      .toDF("doc_id", "text")
    assert(Dedup.cdcChunks(df, "doc_id", "text").count() == 0)
  }
}
