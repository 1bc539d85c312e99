package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Int8 scalar quantization of embedding columns — the cheap tier of
  * the embedding-compression pair ([[ProductQuantization]] is the
  * aggressive tier): one global symmetric scale, each FLOAT dimension
  * stored as a TINYINT code in [-127, 127], plus the exact float norm.
  * A 64-dim vector drops 256 B → 64 code bytes + 8 B norm ≈ 3.6×
  * smaller, and — unlike PQ — the 127-level grid keeps quantization
  * error far below typical neighbor cosine gaps, so recall@k stays
  * ≈ 1 without any re-rank pass (q90 gates this in-query every round).
  *
  * Search is symmetric: queries are encoded with the same scale and
  * scored by the native integer dot ([[graft.plans.VectorExprs.dotI8]]
  * — one primitive loop per pair, no boxing, no float math on the
  * corpus side). cos ≈ dot_i8 · (s/127)² / (‖q‖·‖c‖) with the exact
  * stored norms, so the estimate is unbiased up to per-element rounding.
  *
  * 100 TB shape: `fit` is one scalar max-aggregate over the corpus (a
  * single double crosses the driver); `encode` is a narrow codegen'd
  * map; search is the same broadcast two-phase top-k as
  * [[Similarity.bruteForceTopK]] — the corpus is never shuffled and the
  * per-query funnel is avoided by partition-local heads.
  */
object Int8Quant {

  /** The global symmetric scale: max |x| over every element of the
    * corpus (driver receives one double). Floored at 1e-30 so an
    * all-zero corpus encodes to zeros instead of dividing by zero. */
  def fit(df: DataFrame, vecCol: String): Double = {
    val m = df.agg(max(array_max(transform(col(vecCol), x => abs(x))))).head.get(0)
    math.max(if (m == null) 0.0 else m.asInstanceOf[Number].doubleValue, 1e-30)
  }

  /** codes = clamp(round(x/scale·127)) as ARRAY<TINYINT>, plus the
    * exact float-domain norm for cosine denominators. */
  def encode(df: DataFrame, idCol: String, vecCol: String, scale: Double): DataFrame =
    df.select(col(idCol).as("id"),
      transform(col(vecCol), x =>
        least(greatest(round(x.cast("double") / scale * 127.0, 0), lit(-127.0)), lit(127.0))
          .cast("byte")).as("codes"),
      VectorFunctions.norm(col(vecCol)).as("norm"))

  /** Estimated cosine from two code arrays and exact norms. */
  def cosEst(aCodes: Column, bCodes: Column, aNorm: Column, bNorm: Column,
      scale: Double): Column =
    graft.plans.VectorExprs.dotI8(aCodes, bCodes).cast("double") *
      lit(scale * scale / (127.0 * 127.0)) / (aNorm * bNorm)

  /** IVF-pruned int8 search — the "best of both" compression/pruning
    * pair when PQ's recall floor is unacceptable: coarse spherical
    * k-means lists prune the scan to nProbe/nCentroids of the corpus
    * (exactly [[ProductQuantization.buildIvfPQIndex]]'s list shape),
    * and the probed lists are scored with int8 codes (near-exact
    * in-list ranking — recall is bounded only by list probing, not by
    * quantization). Same list build, different payload: TINYINT codes
    * + exact norm instead of PQ codes. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nProbe: Int, nCentroids: Int, scale: Double,
      seed: Long = 42L, trainCap: Int = 100000, maxIter: Int = 10): DataFrame = {
    def unit(c: Column) = transform(c, x => x.cast("double") / VectorFunctions.norm(c))
    val withVec = corpus.filter(VectorFunctions.norm(col(vecCol)) > 0)
      .select(col(idCol).as("vid"), col(vecCol).as("v"))
    // driver-local spherical fit on a capped sample ([[LocalKMeans]]);
    // one corpus pass does list assignment + int8 encode together,
    // with the centroid matrix riding as a plan constant (no shuffle)
    val sample = LocalKMeans.sample(corpus, vecCol, trainCap, unit = true)
    require(sample.nonEmpty, "IVF fit needs a nonempty corpus")
    val centers = LocalKMeans.fit(sample, 0, sample.head.length, nCentroids, seed, maxIter)
    val lists = withVec.select(
      col("vid").as("id"),
      LocalKMeans.nearestCentId(unit(col("v")), centers).as("cent_id"),
      transform(col("v"), x =>
        least(greatest(round(x.cast("double") / scale * 127.0, 0), lit(-127.0)), lit(127.0))
          .cast("byte")).as("codes"),
      VectorFunctions.norm(col("v")).as("norm"))
    val centDf = LocalKMeans.centersDf(corpus.sparkSession, centers)
    val dist2 = aggregate(
      zip_with(unit(col("qv")), col("centv"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
    val q = encode(queries.filter(VectorFunctions.norm(col(vecCol)) > 0),
        idCol, vecCol, scale)
      .select(col("id").as("q_id"), col("codes").as("q_codes"), col("norm").as("q_norm"))
      .join(queries.select(col(idCol).as("q_id"), col(vecCol).as("qv")), Seq("q_id"))
    val probes = q.join(broadcast(centDf))
      .withColumn("prn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(dist2.asc, col("cent_id"))))
      .filter(col("prn") <= nProbe)
      .select("q_id", "q_codes", "q_norm", "cent_id")
    val cos = cosEst(col("q_codes"), col("codes"), col("q_norm"), col("norm"), scale)
    val cand = broadcast(probes).join(lists, Seq("cent_id"))
      .filter(col("q_id") =!= col("id"))
      .withColumn("pid", spark_partition_id())
    val w1 = Window.partitionBy(col("q_id"), col("pid")).orderBy(cos.desc, col("id"))
    val w2 = Window.partitionBy(col("q_id")).orderBy(cos.desc, col("id"))
    cand
      .withColumn("prn2", row_number().over(w1)).filter(col("prn2") <= k)
      .withColumn("rn", row_number().over(w2)).filter(col("rn") <= k)
      .select(col("q_id"), col("id").as("c_id"), col("rn"),
        graft.functions.TextFunctions.round4(cos).as("cos"))
  }

  /** Symmetric int8 top-k: for each query vector (float input, encoded
    * with the corpus scale), the k nearest encoded candidates by
    * estimated cosine — same contract/shape as
    * [[Similarity.bruteForceTopK]] (self-matches excluded, two-phase
    * rank, ties broken by candidate id). */
  def topK(queries: DataFrame, encodedCorpus: DataFrame, idCol: String,
      vecCol: String, k: Int, scale: Double): DataFrame = {
    val q = encode(queries.filter(VectorFunctions.norm(col(vecCol)) > 0),
        idCol, vecCol, scale)
      .select(col("id").as("q_id"), col("codes").as("q_codes"), col("norm").as("q_norm"))
    val c = encodedCorpus.filter(col("norm") > 0)
    val cos = cosEst(col("q_codes"), col("codes"), col("q_norm"), col("norm"), scale)
    val scored = broadcast(q).join(c, col("q_id") =!= col("id"))
      .withColumn("pid", spark_partition_id())
    val w1 = Window.partitionBy(col("q_id"), col("pid")).orderBy(cos.desc, col("id"))
    val w2 = Window.partitionBy(col("q_id")).orderBy(cos.desc, col("id"))
    scored
      .withColumn("prn", row_number().over(w1)).filter(col("prn") <= k)
      .withColumn("rn", row_number().over(w2)).filter(col("rn") <= k)
      .select(col("q_id"), col("id").as("c_id"), col("rn"),
        graft.functions.TextFunctions.round4(cos).as("cos"))
  }
}
