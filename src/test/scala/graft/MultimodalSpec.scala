package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkSuite {
  private lazy val docs = Tables(spark, sfDir, "documents")

  test("pack → decode: one feature row per asset, deterministic across runs") {
    val assets = Multimodal.packAssets(docs, "doc_id", "text", "image")
    val f1 = Multimodal.decodeFeatures(assets).collect().sortBy(_.asset_id)
    val f2 = Multimodal.decodeFeatures(assets).collect().sortBy(_.asset_id)
    assert(f1.length === docs.count())
    assert(f1.map(_.width).sameElements(f2.map(_.width)), "decode must be deterministic")
    assert(f1.forall(f => f.embedding.length === 8 && f.embedding.forall(x => x >= 0f && x <= 1f)))
  }

  test("resize bounds spatial dims; aspect handling stays within max") {
    val assets = Multimodal.packAssets(docs, "doc_id", "text", "image")
    val r = Multimodal.resize(Multimodal.decodeFeatures(assets), maxDim = 256)
    assert(r.filter(col("out_w") > 256 || col("out_h") > 256).count() === 0)
    assert(r.filter(col("out_w") <= 0 || col("out_h") <= 0).count() === 0)
  }

  test("frame sampling yields ceil(n_frames/N) rows per video asset") {
    val assets = Multimodal.packAssets(docs.limit(50), "doc_id", "text", "video")
    val feats = Multimodal.decodeFeatures(assets).cache()
    val sampled = Multimodal.sampleFrames(feats, everyN = 10)
    val expect = feats.collect().map(f => (f.n_frames + 9) / 10).sum
    assert(sampled.count() === expect)
    assert(sampled.filter(col("frame_idx") % 10 =!= 0).count() === 0)
  }
}
