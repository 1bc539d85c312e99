package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as
  * opaque `BINARY` columns with a typed metadata struct, and decode /
  * feature-extraction runs as a batched per-partition transform (the
  * Scala analogue of a Pandas-UDF-over-`mapInPandas` pipeline stage).
  *
  * The actual codec step is a STUB — this container ships no
  * image/audio libraries, so [[FakeCodec]] derives deterministic
  * pseudo-features from the payload bytes. Everything around it — the
  * schema, the binary packing, the batch shape (fixed-size chunks per
  * partition), the partition-balance repartition, the typed Encoders —
  * is the real production plumbing: swapping FakeCodec for a JNI/FFM
  * decoder changes no dataflow.
  *
  * Scale notes: payloads stay distributed end-to-end (never collected);
  * `decodeBatchSize` bounds per-task memory for large assets; decode is
  * a narrow transformation so it pipelines with the scan.
  */
object Multimodal {

  case class Asset(asset_id: Long, kind: String, payload: Array[Byte],
      mime: String, n_bytes: Long)
  case class Features(asset_id: Long, kind: String, width: Int, height: Int,
      n_frames: Int, embedding: Array[Float])

  val decodeBatchSize = 64

  /** STUB codec: deterministic pseudo-decode from payload bytes. A real
    * implementation calls the native decoder here — per batch, so any
    * native context (decoder handle, GPU stream) amortizes across
    * `decodeBatchSize` assets exactly like a Pandas UDF batch. */
  object FakeCodec {
    def decodeBatch(batch: Seq[Asset]): Seq[Features] = {
      val md = MessageDigest.getInstance("MD5") // one handle per batch
      batch.map { a =>
        md.reset()
        val d = md.digest(a.payload)
        def u(i: Int): Int = d(i) & 0xff
        Features(
          asset_id = a.asset_id,
          kind = a.kind,
          width = 16 * (1 + u(0) % 64), // 16..1024, deterministic in payload
          height = 16 * (1 + u(1) % 64),
          n_frames = if (a.kind == "video") 1 + u(2) % 120 else 1,
          embedding = (0 until 8).map(i => (u(i * 2) * 256 + u(i * 2 + 1)) / 65535.0f).toArray)
      }
    }
  }

  /** Pack a string payload column into the binary asset schema (the
    * fixtures carry no real media, so `documents.text` stands in as the
    * payload bytes; a real ingest reads `spark.read.format("binaryFile")`). */
  def packAssets(df: DataFrame, idCol: String, payloadCol: String, kind: String): Dataset[Asset] = {
    import df.sparkSession.implicits._
    df.select(
        col(idCol).cast("long").as("asset_id"),
        lit(kind).as("kind"),
        encode(col(payloadCol), "UTF-8").as("payload"),
        lit(s"application/x-fake-$kind").as("mime"),
        length(encode(col(payloadCol), "UTF-8")).cast("long").as("n_bytes"))
      .as[Asset]
  }

  /** Batched decode: chunks each partition into `decodeBatchSize`
    * groups and runs the codec once per group. */
  def decodeFeatures(assets: Dataset[Asset]): Dataset[Features] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap(batch => FakeCodec.decodeBatch(batch))
    }
  }

  /** "Resize": scale the fake spatial dims — the shape of a per-asset
    * post-decode transform (pure column math, codegen-eligible). */
  def resize(features: Dataset[Features], maxDim: Int): DataFrame =
    features.toDF().withColumn("scale",
        least(lit(1.0), lit(maxDim) / greatest(col("width"), col("height"))))
      .withColumn("out_w", (col("width") * col("scale")).cast("int"))
      .withColumn("out_h", (col("height") * col("scale")).cast("int"))
      .drop("scale")

  /** Frame sampling for video-kind assets: every `everyN`-th frame
    * index, exploded to (asset_id, frame_idx) rows. */
  def sampleFrames(features: Dataset[Features], everyN: Int): DataFrame = {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    features.toDF()
      .filter(col("kind") === "video")
      .select(col("asset_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyN))).as("frame_idx"))
  }
}
