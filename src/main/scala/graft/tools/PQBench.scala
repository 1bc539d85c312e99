// Search-time record for the product-quantized ANN path:
//
//   sbt "runMain graft.tools.PQBench [nVecs] [nQueries] [k] [reps]"
//
// Compares exact float brute-force top-k against the PQ paths (pure ADC,
// ADC + exact re-rank) on a synthetic blob-structured corpus, with the
// model FIT and corpus ENCODE outside the timed region — at 100 TB those
// are one-time build costs; the record measures the per-search cost a
// user pays, plus recall@k vs the exact ranking for each path. One JSON
// line per variant.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{ProductQuantization, Similarity}

object PQBench {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(200000L)
    val nQ = args.lift(1).map(_.toInt).getOrElse(16)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val reps = args.lift(3).map(_.toInt).getOrElse(3)
    // blob  = isotropic blob+noise (r8's corpus — rotation-invariant by
    //         construction, the hardest case for OPQ to improve);
    // aniso = the same blobs mixed across dims by a fixed dense rotation
    //         AFTER a per-dim exponential variance decay — variance now
    //         straddles the m coordinate blocks, the regime OPQ exists
    //         for (real embeddings after PCA-ish correlation look like
    //         this; Ge et al. §5's GIST case)
    val shape = args.lift(4).getOrElse("blob")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("pq-bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // same deterministic blob generator as SemanticDedupBench: hash-
    // derived latent centers + per-id noise, no RNG objects
    def u(c: org.apache.spark.sql.Column) =
      (pmod(xxhash64(c), lit(100000L)).cast("double") / 100000.0) - 0.5
    val dim = 64
    val nBlobs = math.max(64, (n / 500).toInt)
    // aniso: exponential per-dim variance decay (0.93^i spans ~2 decades)
    // before the fixed dense mix below
    val decay = (i: org.apache.spark.sql.Column) =>
      if (shape == "aniso") pow(lit(0.93), i) else lit(1.0)
    val emb0 = spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), i =>
          ((u(concat_ws(",", lit("blob"), pmod(col("id"), lit(nBlobs.toLong)), i))
            + u(concat_ws(",", lit("noise"), col("id"), i)) * lit(0.15)) * decay(i))
            .cast("float")).as("embedding"))
    val emb = (if (shape == "aniso") {
        // fixed seeded orthonormal mix (QR of a gaussian matrix): the
        // decayed variance directions no longer align with the m
        // coordinate blocks — what a learned rotation should undo
        val rnd = new java.util.Random(7)
        val g = breeze.linalg.DenseMatrix.fill(dim, dim)(rnd.nextGaussian())
        val qr = breeze.linalg.qr(g)
        val mix = Array.tabulate(dim, dim)((i, j) => qr.q(i, j))
        emb0.select(col("vec_id"),
          ProductQuantization.rotateVec(col("embedding"), mix).as("embedding"))
      } else emb0)
      .persist()
    emb.count()
    val qPred = col("vec_id") < nQ
    val queries = emb.filter(qPred).persist()
    queries.count()

    // build phase (untimed): fit + encode + materialize the code table
    val model = ProductQuantization.fit(emb, "embedding", m = 8, k = 32)
    val encoded = ProductQuantization.encode(emb, "vec_id", "embedding", model).persist()
    encoded.count()
    // OPQ build (untimed): learned rotation + codebooks, rotated code table
    val opq = ProductQuantization.fitOPQ(emb, "embedding", m = 8, k = 32)
    val encodedOPQ = ProductQuantization.encodeOPQ(emb, "vec_id", "embedding", opq).persist()
    encodedOPQ.count()

    val exactIds = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k)
      .groupBy("q_id").agg(collect_set(col("c_id")).as("exact_ids")).persist()
    exactIds.count()

    def recallOf(df: org.apache.spark.sql.DataFrame): Double =
      exactIds.join(df.groupBy("q_id").agg(collect_set(col("c_id")).as("ids")),
          Seq("q_id"), "left")
        .select((coalesce(size(array_intersect(col("ids"), col("exact_ids"))), lit(0))
          .cast("double") / k).as("r"))
        .agg(avg("r")).head.getDouble(0)

    // int8 + IVF build phases (untimed, like PQ's: one-time ingest costs)
    val i8scale = graft.operators.Int8Quant.fit(emb, "embedding")
    val i8encoded = graft.operators.Int8Quant.encode(emb, "vec_id", "embedding", i8scale).persist()
    i8encoded.count()
    val ivfIndex = ProductQuantization.buildIvfPQIndex(emb, "vec_id", "embedding",
      nCentroids = 64, model)
    val ivfCached = ivfIndex.copy(encodedLists = ivfIndex.encodedLists.persist())
    ivfCached.encodedLists.count()
    val (residIdx0, residModel) = ProductQuantization.buildIvfPQResidualIndex(
      emb, "vec_id", "embedding", nCentroids = 64, m = 8, kCodes = 32)
    val residIdx = residIdx0.copy(encodedLists = residIdx0.encodedLists.persist())
    residIdx.encodedLists.count()

    def variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      ("brute_force_float", () =>
        Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k)),
      ("int8_symmetric", () =>
        graft.operators.Int8Quant.topK(queries, i8encoded, "vec_id", "embedding", k, i8scale)),
      ("pq_adc", () =>
        ProductQuantization.adcTopK(queries, encoded, "vec_id", "embedding", k, model)),
      ("pq_adc_rerank100", () =>
        ProductQuantization.adcTopKReranked(queries, encoded, emb,
          "vec_id", "embedding", k, shortlist = 100, model)),
      // remedy 1: learned rotation, SAME shortlist — equal search cost
      ("opq_adc_rerank100", () =>
        ProductQuantization.adcTopKRerankedOPQ(queries, encodedOPQ, emb,
          "vec_id", "embedding", k, shortlist = 100, opq)),
      // remedy 2: shortlist scaled with corpus size (n/1000)
      ("pq_adc_rerank_scaled", () =>
        ProductQuantization.adcTopKReranked(queries, encoded, emb,
          "vec_id", "embedding", k,
          shortlist = ProductQuantization.scaledShortlist(n, k), model)),
      // both remedies composed
      ("opq_adc_rerank_scaled", () =>
        ProductQuantization.adcTopKRerankedOPQ(queries, encodedOPQ, emb,
          "vec_id", "embedding", k,
          shortlist = ProductQuantization.scaledShortlist(n, k), opq)),
      ("ivfpq_rerank100_probe4of64", () =>
        ProductQuantization.ivfPQSearch(queries, ivfCached, emb, "vec_id", "embedding",
          k, nProbe = 4, shortlist = 100, model)),
      ("ivfpq_residual_rerank100_probe4of64", () =>
        ProductQuantization.ivfPQResidualSearch(queries, residIdx, emb, "vec_id", "embedding",
          k, nProbe = 4, shortlist = 100, residModel)))

    for ((tag, mk) <- variants) {
      mk().write.format("noop").mode("overwrite").save() // warmup
      val samples = Vector.fill(reps) {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val rec = recallOf(mk())
      println(f"""{"variant":"$tag","corpus":"$shape","vecs":$n,"queries":$nQ,"k":$k,"reps":$reps,""" +
        f""""min_sec":${samples.head}%.3f,"median_sec":${samples(samples.size / 2)}%.3f,""" +
        f""""recall_at_k":$rec%.3f}""")
    }
    spark.stop()
  }
}
