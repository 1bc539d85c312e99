package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorFunctions}
import graft.plans.PQExprs

/** Product-quantization embedding compression + ADC search (Jégou et
  * al., TPAMI 2011) — the missing cost lever for the ANN family at
  * 100 TB: with 64-dim FLOAT embeddings the store is 256 B/vector;
  * PQ(m=8, k=32) stores 8 code bytes + a 4-byte norm (≈ 21×
  * smaller), and the scan side of a search reads ONLY codes.
  *
  * Scale shape:
  *  - [[fit]] trains m tiny per-subspace codebooks on a capped,
  *    cached sample (same bounded-by-design argument as
  *    [[Similarity.ivfKMeansTopK]]); the model is a few KB on the
  *    driver and rides expressions as a constant.
  *  - [[encode]] is one narrow map over the corpus (native
  *    [[graft.plans.PQExprs.PQEncodeExpr]] — no shuffle, no UDF).
  *  - [[adcTopK]] broadcasts the (small) query set WITH per-query
  *    lookup tables, so the per-candidate cost is m byte-indexed adds
  *    (native [[graft.plans.PQExprs.PQAdcDotExpr]]) — no float math
  *    against the corpus, and the corpus is never shuffled. Top-k uses
  *    the same two-phase per-partition window as
  *    [[Similarity.bruteForceTopK]], so no per-query funnel.
  *
  * Scores are approximate by construction (quantization error), which
  * is why the declared query self-gates on recall against the exact
  * brute-force ranking (q45's pattern) instead of oracle-matching
  * scores. */
object ProductQuantization {

  /** Per-subspace codebooks: `codebooks(s)(j)` = centroid j of
    * subspace s, each of width `subDim`. */
  case class PQModel(subDim: Int, codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def dim: Int = m * subDim
  }

  /** Train per-subspace k-means codebooks. Deterministic for a fixed
    * seed; ONE capped sample collect is shared by all m driver-local
    * fits (each fit reads its own slice of the same rows) — see
    * [[LocalKMeans]] for why local-on-a-capped-sample is the scale
    * shape here. */
  def fit(emb: DataFrame, vecCol: String, m: Int, k: Int, seed: Long = 42L,
      trainCap: Int = 100000, maxIter: Int = 10): PQModel = {
    val sample = LocalKMeans.sample(emb, vecCol, trainCap, unit = false)
    fitOnSample(sample, m, k, seed, maxIter)
  }

  private def fitOnSample(sample: Array[Array[Double]], m: Int, k: Int,
      seed: Long, maxIter: Int): PQModel = {
    require(sample.nonEmpty, "PQ fit needs a nonempty training sample")
    val dim = sample.head.length
    require(dim % m == 0, s"dim=$dim not divisible by m=$m subspaces")
    val subDim = dim / m
    val codebooks = (0 until m).map { s =>
      LocalKMeans.fit(sample, s * subDim, subDim, k, seed + s, maxIter)
    }.toArray
    PQModel(subDim, codebooks)
  }

  /** Encode the corpus: (vid, codes ARRAY<TINYINT>, vnorm FLOAT). The
    * true norm is kept so ADC cosine uses the exact denominator — the
    * only approximation is in the numerator's quantized dot. */
  def encode(emb: DataFrame, idCol: String, vecCol: String, model: PQModel): DataFrame =
    emb.filter(VectorFunctions.norm(col(vecCol)) > 0)
      .select(col(idCol).as("vid"),
        PQExprs.pqEncode(col(vecCol), model.codebooks).as("codes"),
        VectorFunctions.norm(col(vecCol)).cast("float").as("vnorm"))

  /** Per-query LUT: lut(s)(j) = dot(q_s, codebook(s)(j)). Computed once
    * per QUERY row (higher-order functions over the codebook literal —
    * the query side is small by contract), so the per-candidate path
    * never touches the codebook. */
  private def lutFor(model: PQModel, qv: Column): Column = {
    val cbLit = typedLit(model.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    transform(sequence(lit(0), lit(model.m - 1)), s =>
      transform(element_at(cbLit, s + lit(1)), cvec =>
        VectorFunctions.dot(slice(qv, s * lit(model.subDim) + lit(1), lit(model.subDim)), cvec)))
  }

  /** ADC top-k: identical contract to [[Similarity.bruteForceTopK]]
    * (per-query k best by cosine, id tie-break) but the corpus side is
    * scanned as codes, scored with the approximate quantized dot over
    * the exact norms. `encoded` should come from [[encode]] over the
    * same model — pre-materialize it once and reuse across query
    * batches (that is the 100 TB story: the float corpus is read once
    * at encode time, never again). */
  def adcTopK(queries: DataFrame, encoded: DataFrame, idCol: String,
      vecCol: String, k: Int, model: PQModel): DataFrame = {
    val q = queries.filter(VectorFunctions.norm(col(vecCol)) > 0)
      .select(col(idCol).as("q_id"), col(vecCol).as("qv"))
      .withColumn("qnorm", VectorFunctions.norm(col("qv")))
      .withColumn("lut", lutFor(model, col("qv")))
      .select("q_id", "qnorm", "lut")
    val score = PQExprs.pqAdcDot(col("codes"), col("lut")) / (col("qnorm") * col("vnorm"))
    val scored = broadcast(q).join(encoded, col("q_id") =!= col("vid"))
      .withColumn("pid", spark_partition_id())
    val w1 = Window.partitionBy(col("q_id"), col("pid")).orderBy(score.desc, col("vid"))
    val w2 = Window.partitionBy(col("q_id")).orderBy(score.desc, col("vid"))
    scored
      .withColumn("prn", row_number().over(w1)).filter(col("prn") <= k)
      .withColumn("rn", row_number().over(w2)).filter(col("rn") <= k)
      .select(col("q_id"), col("vid").as("c_id"), col("rn"),
        TextFunctions.round4(score).as("adc_cos"))
  }

  /** ADC + EXACT RE-RANK — the standard production PQ search (Jégou et
    * al. §V): the compressed scan produces a per-query shortlist of
    * `shortlist` candidates by approximate score, then ONLY those rows
    * fetch their float vectors for exact cosine re-ranking. On
    * near-uniform embeddings pure ADC recall collapses (quantization
    * error ≫ the cosine gaps between neighbors — measured 0.22 on the
    * synthetic fixtures) while the shortlist still contains the true
    * neighbors; re-ranking recovers them at a float-read cost of
    * O(queries × shortlist), independent of corpus size. The re-rank
    * join broadcasts the (small) shortlist against the corpus, so the
    * float side is still never shuffled. */
  def adcTopKReranked(queries: DataFrame, encoded: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, shortlist: Int,
      model: PQModel): DataFrame = {
    require(shortlist >= k, s"shortlist=$shortlist must be >= k=$k")
    val short = adcTopK(queries, encoded, idCol, vecCol, shortlist, model)
      .select(col("q_id"), col("c_id"))
    val qv = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
    val cv = corpus.select(col(idCol).as("c_id"), col(vecCol).as("cv"))
    val cos = VectorFunctions.cosine(col("qv"), col("cv"))
    // shortlist is queries×shortlist rows — broadcast it; each corpus
    // partition streams past it and only matching ids surface floats
    val withVecs = broadcast(short.join(broadcast(qv), Seq("q_id"))).join(cv, Seq("c_id"))
    // per-query group is ≤ shortlist rows — bounded, no funnel
    val w = Window.partitionBy(col("q_id")).orderBy(cos.desc, col("c_id"))
    withVecs
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("q_id"), col("c_id"), col("rn"), TextFunctions.round4(cos).as("cos"))
  }

  /** IVF + PQ + re-rank — the full production ANN stack (the shape
    * FAISS calls IVFPQ, Jégou et al. §VI): coarse spherical-k-means
    * lists PRUNE the scan (each query touches only its `nProbe`
    * nearest lists ≈ nProbe/nCentroids of the corpus), PQ codes
    * COMPRESS what remains (the probed scan reads bytes, not floats),
    * ADC scores it, and the exact re-rank of a bounded shortlist
    * restores recall. At 100 TB the three levers compose: scan volume
    * falls by the probe ratio × the ~21× code compression, while
    * float reads stay O(queries × shortlist).
    *
    * This variant quantizes raw vectors within lists (IVF-Flat codes,
    * not residual codes): one shared codebook serves every list, so
    * `encode`'s output can be reused by [[adcTopK]] unchanged. The
    * coarse fit mirrors [[Similarity.ivfKMeansTopK]] (unit vectors →
    * Euclidean k-means = spherical; capped cached train set; `random`
    * init). Lists are materialized as a `cent_id` column — i.e. the
    * partition-pruning story is the same equi-join-on-list-id every
    * IVF variant here uses, never a per-query corpus scan. */
  /** The built IVF-PQ index: coarse centroids (driver-bounded,
    * broadcastable) + the encoded corpus with list assignment. At
    * 100 TB this pair is materialized ONCE at ingest (write
    * `encodedLists` partitioned by cent_id and the probe join becomes
    * partition-pruned) and searched many times. */
  case class IvfPQIndex(centroids: DataFrame, encodedLists: DataFrame)

  /** Build phase: coarse spherical-k-means fit (capped cached train
    * set) + ONE pass over the corpus computing list assignment and PQ
    * codes together. */
  def buildIvfPQIndex(corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, model: PQModel, seed: Long = 42L,
      trainCap: Int = 100000, maxIter: Int = 10): IvfPQIndex = {
    // spherical coarse quantizer: fit on unit vectors (bounded sample,
    // driver-local), assign with the SAME Euclidean metric as one
    // narrow map — the centroid matrix is a plan constant, so the
    // corpus is never shuffled to build the lists
    val centers = LocalKMeans.fit(
      LocalKMeans.sample(corpus, vecCol, trainCap, unit = true),
      0, model.dim, nCentroids, seed, maxIter)
    IvfPQIndex(LocalKMeans.centersDf(corpus.sparkSession, centers),
      encodeIvfLists(corpus, idCol, vecCol, centers, model))
  }

  /** The one-pass list build against FROZEN centers: (vid, cent_id,
    * codes, vnorm). Shared by the initial build and incremental
    * ingest. */
  private def encodeIvfLists(corpus: DataFrame, idCol: String, vecCol: String,
      centers: Array[Array[Double]], model: PQModel): DataFrame = {
    def unit(c: Column) = transform(c, x => x.cast("double") / VectorFunctions.norm(c))
    corpus.filter(VectorFunctions.norm(col(vecCol)) > 0)
      .select(col(idCol).as("vid"), col(vecCol).as("v"))
      .select(col("vid"),
        LocalKMeans.nearestCentId(unit(col("v")), centers).as("cent_id"),
        PQExprs.pqEncode(col("v"), model.codebooks).as("codes"),
        VectorFunctions.norm(col("v")).cast("float").as("vnorm"))
  }

  /** INCREMENTAL IVF INGEST: a new embedding batch joins an existing
    * index by assignment against the FROZEN centroids + PQ codebooks —
    * no re-clustering, no touch of resident lists. This is the daily
    * shape at 100 TB: the quantizers are versioned artifacts retrained
    * rarely (they are sample-capped fits, see [[LocalKMeans]]); ingest
    * cost is ONE narrow map over the new batch and a list union.
    * Exactly equal, by construction, to rebuilding monolithically with
    * the same frozen centers — q155 asserts that equality end-to-end
    * through the search path. */
  def appendIvfPQ(index: IvfPQIndex, fresh: DataFrame, idCol: String,
      vecCol: String, model: PQModel): IvfPQIndex = {
    val centers = centersOf(index)
    IvfPQIndex(index.centroids,
      index.encodedLists.unionByName(
        encodeIvfLists(fresh, idCol, vecCol, centers, model)))
  }

  /** The (small) centroid matrix back on the driver, cent_id order. */
  private[graft] def centersOf(index: IvfPQIndex): Array[Array[Double]] =
    index.centroids.orderBy("cent_id").collect()
      .map(_.getSeq[Double](1).toArray)

  def ivfAdcTopKReranked(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nProbe: Int, nCentroids: Int, shortlist: Int,
      model: PQModel, seed: Long = 42L, trainCap: Int = 100000,
      maxIter: Int = 10): DataFrame = {
    val index = buildIvfPQIndex(corpus, idCol, vecCol, nCentroids, model,
      seed, trainCap, maxIter)
    ivfPQSearch(queries, index, corpus, idCol, vecCol, k, nProbe, shortlist, model)
  }

  /** Search phase against a pre-built [[IvfPQIndex]] — the per-query
    * cost a production deployment pays (the bench tool times this with
    * the build outside the measured region). */
  def ivfPQSearch(queries: DataFrame, index: IvfPQIndex, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int, shortlist: Int,
      model: PQModel): DataFrame = {
    require(shortlist >= k, s"shortlist=$shortlist must be >= k=$k")
    def unit(c: Column) = transform(c, x => x.cast("double") / VectorFunctions.norm(c))
    val encodedLists = index.encodedLists
    val centDf = index.centroids
    // per-query LUT computed ONCE (before probe fan-out duplicates the row)
    val qs = queries.filter(VectorFunctions.norm(col(vecCol)) > 0)
      .select(col(idCol).as("q_id"), col(vecCol).as("qv"))
      .withColumn("qnorm", VectorFunctions.norm(col("qv")))
      .withColumn("lut", lutFor(model, col("qv")))
    // probe ranking uses the same Euclidean-on-unit-vectors metric the
    // assignment used (see ivfKMeansTopK's rationale)
    val dist2 = aggregate(
      zip_with(unit(col("qv")), col("centv"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
    val probes = qs.join(broadcast(centDf))
      .withColumn("prn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(dist2.asc, col("cent_id"))))
      .filter(col("prn") <= nProbe)
      .select("q_id", "qv", "qnorm", "lut", "cent_id")
    val score = PQExprs.pqAdcDot(col("codes"), col("lut")) / (col("qnorm") * col("vnorm"))
    val cand = broadcast(probes.drop("qv")).join(encodedLists, Seq("cent_id"))
      .filter(col("q_id") =!= col("vid"))
      .withColumn("pid", spark_partition_id())
    val w1 = Window.partitionBy(col("q_id"), col("pid")).orderBy(score.desc, col("vid"))
    val w2 = Window.partitionBy(col("q_id")).orderBy(score.desc, col("vid"))
    val short = cand
      .withColumn("srn", row_number().over(w1)).filter(col("srn") <= shortlist)
      .withColumn("rn2", row_number().over(w2)).filter(col("rn2") <= shortlist)
      .select(col("q_id"), col("vid").as("c_id"))
    exactRerank(short, queries, corpus, idCol, vecCol, k)
  }

  /** Exact re-rank of a bounded (q_id, c_id) shortlist — the shared
    * tail of every *Reranked search: the shortlist broadcasts, each
    * corpus partition streams past it, and only matching ids surface
    * floats (reads O(queries × shortlist), never corpus-sized). */
  private def exactRerank(short: DataFrame, queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val qv = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
    val cv = corpus.select(col(idCol).as("c_id"), col(vecCol).as("cv"))
    val cos = VectorFunctions.cosine(col("qv"), col("cv"))
    val withVecs = broadcast(short.join(broadcast(qv), Seq("q_id"))).join(cv, Seq("c_id"))
    val w = Window.partitionBy(col("q_id")).orderBy(cos.desc, col("c_id"))
    withVecs
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("q_id"), col("c_id"), col("rn"), TextFunctions.round4(cos).as("cos"))
  }

  /** RESIDUAL-coded IVF-PQ build — the FAISS IVFPQ default: vectors are
    * PQ-coded as residuals from their coarse centroid, not as raw
    * vectors. Residuals have far smaller magnitude than vectors (the
    * coarse step removed the blob structure), so the same m×k codebook
    * budget buys a much finer grid — recall rises at identical storage.
    * The codebook is trained on residuals and SHARED across lists, so
    * search still needs only one LUT per query (plus an exact
    * dot(q, centroid) scalar per probe, computed on the driver-bounded
    * centroid set). Two corpus passes at build time (assign, then
    * residual-encode) — one-time ingest cost, same as the raw path's
    * fit+encode. */
  def buildIvfPQResidualIndex(corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, m: Int, kCodes: Int, seed: Long = 42L,
      trainCap: Int = 100000, maxIter: Int = 10): (IvfPQIndex, PQModel) = {
    def unit(c: Column) = transform(c, x => x.cast("double") / VectorFunctions.norm(c))
    val withVec = corpus.filter(VectorFunctions.norm(col(vecCol)) > 0)
      .select(col(idCol).as("vid"), col(vecCol).as("v"))
    val sample = LocalKMeans.sample(corpus, vecCol, trainCap, unit = true)
    require(sample.nonEmpty, "residual index needs a nonempty corpus")
    val centers = LocalKMeans.fit(sample, 0, sample.head.length, nCentroids, seed, maxIter)
    val centDf = LocalKMeans.centersDf(corpus.sparkSession, centers)
    val withRes = withVec
      .withColumn("cent_id", LocalKMeans.nearestCentId(unit(col("v")), centers))
      .join(broadcast(centDf), Seq("cent_id"))
      .withColumn("r", zip_with(col("v"), col("centv"),
        (x, y) => x.cast("double") - y))
    val model = fit(withRes, "r", m, kCodes, seed, trainCap, maxIter)
    val encodedLists = withRes.select(col("vid"), col("cent_id"),
      PQExprs.pqEncode(col("r"), model.codebooks).as("codes"),
      VectorFunctions.norm(col("v")).cast("float").as("vnorm"))
    (IvfPQIndex(centDf, encodedLists), model)
  }

  /** Search a residual-coded index: dot(q, v) decomposes exactly as
    * dot(q, c) + dot(q, r) — the first term is computed exactly per
    * (query, probed list) against the float centroid, the second is
    * the shared-codebook ADC lookup over the residual codes. Same
    * probe/shortlist/re-rank scaffolding as [[ivfPQSearch]]. */
  def ivfPQResidualSearch(queries: DataFrame, index: IvfPQIndex, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int, shortlist: Int,
      model: PQModel): DataFrame = {
    require(shortlist >= k, s"shortlist=$shortlist must be >= k=$k")
    def unit(c: Column) = transform(c, x => x.cast("double") / VectorFunctions.norm(c))
    val qs = queries.filter(VectorFunctions.norm(col(vecCol)) > 0)
      .select(col(idCol).as("q_id"), col(vecCol).as("qv"))
      .withColumn("qnorm", VectorFunctions.norm(col("qv")))
      .withColumn("lut", lutFor(model, col("qv")))
    val dist2 = aggregate(
      zip_with(unit(col("qv")), col("centv"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
    val probes = qs.join(broadcast(index.centroids))
      .withColumn("prn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(dist2.asc, col("cent_id"))))
      .filter(col("prn") <= nProbe)
      .withColumn("dotqc", VectorFunctions.dot(col("qv"), col("centv")))
      .select("q_id", "qnorm", "lut", "cent_id", "dotqc")
    val score = (col("dotqc") + PQExprs.pqAdcDot(col("codes"), col("lut"))) /
      (col("qnorm") * col("vnorm"))
    val cand = broadcast(probes).join(index.encodedLists, Seq("cent_id"))
      .filter(col("q_id") =!= col("vid"))
      .withColumn("pid", spark_partition_id())
    val w1 = Window.partitionBy(col("q_id"), col("pid")).orderBy(score.desc, col("vid"))
    val w2 = Window.partitionBy(col("q_id")).orderBy(score.desc, col("vid"))
    val short = cand
      .withColumn("srn", row_number().over(w1)).filter(col("srn") <= shortlist)
      .withColumn("rn2", row_number().over(w2)).filter(col("rn2") <= shortlist)
      .select(col("q_id"), col("vid").as("c_id"))
    exactRerank(short, queries, corpus, idCol, vecCol, k)
  }

  // ------------------------------------------------------------- OPQ

  /** OPQ model: an orthonormal rotation applied before PQ coding
    * (Ge, He, Ke & Sun, "Optimized Product Quantization", CVPR 2013,
    * the non-parametric variant). PQ's weakness is subspace
    * MISALIGNMENT: when variance concentrates in directions that span
    * several of the m fixed coordinate blocks, every block's codebook
    * wastes its k codes on correlated structure. The learned rotation
    * re-axes the data so quantization error is minimized across
    * blocks; search cost is UNCHANGED (the corpus is rotated once at
    * encode time; each query pays one d×d matvec before its LUT —
    * nothing per candidate), which is exactly the "recall remedy at
    * equal cost" PQ needs on hard corpora. */
  case class OPQModel(rotation: Array[Array[Double]], pq: PQModel)

  private def matvec(r: Array[Array[Double]], x: Array[Double]): Array[Double] = {
    val d = r.length
    val out = new Array[Double](d)
    var i = 0
    while (i < d) {
      var acc = 0.0
      val ri = r(i)
      var j = 0
      while (j < d) { acc += ri(j) * x(j); j += 1 }
      out(i) = acc; i += 1
    }
    out
  }

  /** Nearest-codebook reconstruction of one (already rotated) vector. */
  private def reconstruct(model: PQModel, x: Array[Double]): Array[Double] = {
    val out = new Array[Double](model.dim)
    var s = 0
    while (s < model.m) {
      val cb = model.codebooks(s)
      var bestJ = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < cb.length) {
        var d2 = 0.0
        var t = 0
        while (t < model.subDim) {
          val diff = x(s * model.subDim + t) - cb(j)(t)
          d2 += diff * diff; t += 1
        }
        if (d2 < bestD) { bestD = d2; bestJ = j }
        j += 1
      }
      System.arraycopy(cb(bestJ), 0, out, s * model.subDim, model.subDim)
      s += 1
    }
    out
  }

  /** Alternating OPQ fit: (a) fix R, train PQ codebooks on {Rx};
    * (b) fix the quantized reconstructions Y, update R by orthogonal
    * Procrustes — R = UVᵀ from the SVD of M = Σ y xᵀ (breeze, a d×d
    * driver-local solve). The train sample is capped lower than plain
    * [[fit]]'s (the Σ y xᵀ accumulation is O(n·d²)); both stay
    * one-time driver-side build costs. Deterministic for a fixed
    * seed. */
  def fitOPQ(emb: DataFrame, vecCol: String, m: Int, k: Int, seed: Long = 42L,
      trainCap: Int = 20000, maxIter: Int = 10, opqIters: Int = 8): OPQModel = {
    val sample = LocalKMeans.sample(emb, vecCol, trainCap, unit = false)
    require(sample.nonEmpty, "OPQ fit needs a nonempty training sample")
    val dim = sample.head.length
    var r = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    var model = fitOnSample(sample, m, k, seed, maxIter)
    var it = 0
    while (it < opqIters) {
      val rotated = sample.map(matvec(r, _))
      model = fitOnSample(rotated, m, k, seed, maxIter)
      // Procrustes: M = Σ y·xᵀ over the ORIGINAL sample; R = U·Vᵀ
      val acc = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
      var n = 0
      while (n < sample.length) {
        val y = reconstruct(model, matvec(r, sample(n)))
        val x = sample(n)
        var i = 0
        while (i < dim) {
          val yi = y(i)
          var j = 0
          while (j < dim) { acc(i, j) += yi * x(j); j += 1 }
          i += 1
        }
        n += 1
      }
      val breeze.linalg.svd.SVD(u, _, vt) = breeze.linalg.svd(acc)
      val rm = u * vt
      r = Array.tabulate(dim, dim)((i, j) => rm(i, j))
      it += 1
    }
    val rotated = sample.map(matvec(r, _))
    OPQModel(r, fitOnSample(rotated, m, k, seed, maxIter))
  }

  /** The rotation as a column expression (y_i = Σ_j R(i)(j)·x_j) —
    * applied corpus-side once at encode time and query-side once per
    * query; never in the per-candidate path. */
  def rotateVec(v: Column, rotation: Array[Array[Double]]): Column = {
    val rLit = typedLit(rotation.map(_.toSeq).toSeq)
    transform(rLit, row =>
      aggregate(zip_with(row, v, (a, b) => a * b.cast("double")),
        lit(0.0), (acc, x) => acc + x).cast("float"))
  }

  /** [[encode]] over the rotated corpus (one-time ingest pass). */
  def encodeOPQ(emb: DataFrame, idCol: String, vecCol: String,
      opq: OPQModel): DataFrame =
    encode(emb.withColumn(vecCol, rotateVec(col(vecCol), opq.rotation)),
      idCol, vecCol, opq.pq)

  /** OPQ ADC search: rotate the QUERY (one matvec), then the standard
    * ADC scan — rotation is orthonormal, so quantized-dot(Rq, Rv)
    * estimates dot(q, v) and norms are preserved. */
  def adcTopKOPQ(queries: DataFrame, encoded: DataFrame, idCol: String,
      vecCol: String, k: Int, opq: OPQModel): DataFrame =
    adcTopK(queries.withColumn(vecCol, rotateVec(col(vecCol), opq.rotation)),
      encoded, idCol, vecCol, k, opq.pq)

  /** OPQ ADC + exact re-rank: the shortlist comes from the rotated
    * ADC scan; the re-rank reads the ORIGINAL float corpus (cosine is
    * rotation-invariant, so re-ranking in the original space is both
    * correct and avoids materializing a rotated float corpus). */
  def adcTopKRerankedOPQ(queries: DataFrame, encoded: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, shortlist: Int,
      opq: OPQModel): DataFrame = {
    require(shortlist >= k, s"shortlist=$shortlist must be >= k=$k")
    val short = adcTopKOPQ(queries, encoded, idCol, vecCol, shortlist, opq)
      .select(col("q_id"), col("c_id"))
    exactRerank(short, queries, corpus, idCol, vecCol, k)
  }

  /** Shortlist-scaling rule (the second recall remedy): a FIXED
    * shortlist's recall decays as the corpus grows — the quantized
    * ranking's error stays put while the number of decoys above the
    * true neighbors grows ∝ n. Scaling the shortlist with n/1000
    * (floored at 4k, capped so the float re-read stays bounded) holds
    * the recall floor across corpus decades at a re-rank cost that is
    * still O(queries × shortlist), microscopic next to the scan. */
  def scaledShortlist(corpusSize: Long, k: Int,
      cap: Int = 4096): Int =
    math.max(4 * k, math.min(cap, (corpusSize / 1000L).toInt))
}
