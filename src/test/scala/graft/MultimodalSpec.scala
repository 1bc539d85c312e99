package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkSuite {
  private lazy val docs = Tables(spark, sfDir, "documents")

  test("codec is a real pixel decode: known-pixel PNG gives exact dims and embedding") {
    // hand-built 8x4 PNG: left half black, right half white — the 2x4
    // grid embedding must be exactly [0,0,1,1, 0,0,1,1]
    val img = new java.awt.image.BufferedImage(8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val f = Multimodal.ImageCodec.decodeBatch(Seq(
      Multimodal.Asset(1L, "image", bos.toByteArray, "image/png", bos.size().toLong))).head
    assert(f.width === 8 && f.height === 4 && f.n_frames === 1)
    assert(f.embedding.toSeq === Seq(0f, 0f, 1f, 1f, 0f, 0f, 1f, 1f))
  }

  test("video container round-trip: synthesized frame count survives decode") {
    val seed = "some deterministic seed".getBytes("UTF-8")
    val payload = Multimodal.ImageSynth.videoBytes(seed)
    val f = Multimodal.ImageCodec.decodeBatch(Seq(
      Multimodal.Asset(2L, "video", payload, "video/x-graft-frames", payload.length.toLong))).head
    assert(f.n_frames >= 1 && f.n_frames <= 24)
    assert(f.width >= 8 && f.width <= 31 && f.height >= 8 && f.height <= 31)
    // same seed, same bytes, same features
    assert(Multimodal.ImageSynth.videoBytes(seed).toSeq === payload.toSeq)
  }

  test("pack → decode: one feature row per asset, deterministic across runs") {
    val assets = Multimodal.synthesizeAssets(docs, "doc_id", "text", "image")
    val f1 = Multimodal.decodeFeatures(assets).collect().sortBy(_.asset_id)
    val f2 = Multimodal.decodeFeatures(assets).collect().sortBy(_.asset_id)
    assert(f1.length === docs.count())
    assert(f1.map(_.width).sameElements(f2.map(_.width)), "decode must be deterministic")
    assert(f1.forall(f => f.embedding.length === 8 && f.embedding.forall(x => x >= 0f && x <= 1f)))
  }

  test("resize bounds spatial dims; aspect handling stays within max") {
    val assets = Multimodal.synthesizeAssets(docs, "doc_id", "text", "image")
    val r = Multimodal.resize(Multimodal.decodeFeatures(assets), maxDim = 256)
    assert(r.filter(col("out_w") > 256 || col("out_h") > 256).count() === 0)
    assert(r.filter(col("out_w") <= 0 || col("out_h") <= 0).count() === 0)
  }

  test("frame sampling yields ceil(n_frames/N) rows per video asset") {
    val assets = Multimodal.synthesizeAssets(docs.limit(50), "doc_id", "text", "video")
    val feats = Multimodal.decodeFeatures(assets).cache()
    val sampled = Multimodal.sampleFrames(feats, everyN = 10)
    val expect = feats.collect().map(f => (f.n_frames + 9) / 10).sum
    assert(sampled.count() === expect)
    assert(sampled.filter(col("frame_idx") % 10 =!= 0).count() === 0)
    // q40 counts sampled frames in-pass as size(sequence(0, n_frames-1, N))
    // instead of re-decoding the videos for an explode+count — assert that
    // closed form is exactly sampleFrames' cardinality
    val inPass = feats.toDF()
      .agg(sum(size(sequence(lit(0), col("n_frames") - 1, lit(10))))).head.getLong(0)
    assert(inPass === expect)
  }
}
