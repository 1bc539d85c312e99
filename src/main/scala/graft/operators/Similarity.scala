package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorFunctions}

/** Approximate-nearest-neighbor search over an `ARRAY<FLOAT>` embedding
  * column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k. The (small) query set is
  *    broadcast and streamed past the candidate corpus — no shuffle of
  *    the big side, embarrassingly parallel, the right baseline even at
  *    100 TB when the query set fits in a broadcast.
  *  - [[lshTopK]]: random-hyperplane LSH — vectors are bucketed by the
  *    sign pattern of `planes` pseudo-random projections, and search is
  *    an equi-join on the bucket key. Trades recall for turning the
  *    cross product into a hash join; bucket skew is AQE-handled.
  *
  * All ranking uses exact (unrounded) cosine with an id tie-break so
  * results are deterministic; the reported score is rounded for stable
  * cross-engine comparison.
  */
object Similarity {

  /** Exact top-k: for each query vector, the k nearest candidates by
    * cosine (excluding self-matches on id). */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    // zero-magnitude vectors have undefined cosine (0/0 = NaN, which
    // both engines sort above every real score) — exclude them
    val q = queries.filter(VectorFunctions.norm(col(vecCol)) > 0)
      .select(col(idCol).as("q_id"), col(vecCol).as("qv"))
    val c = candidates.filter(VectorFunctions.norm(col(vecCol)) > 0)
      .select(col(idCol).as("c_id"), col(vecCol).as("cv"))
    val cos = VectorFunctions.cosine(col("qv"), col("cv"))
    // two-phase top-k: a single window over q_id would funnel each
    // query's entire corpus-sized candidate list into one task. Phase 1
    // keeps k per (query, input partition) — balanced across the
    // cluster; phase 2 merges the <= k * numPartitions survivors per
    // query. The union of per-partition winners always contains the
    // global top k, so results are exact.
    val scored = broadcast(q).join(c, col("q_id") =!= col("c_id"))
      .withColumn("pid", spark_partition_id())
    val w1 = Window.partitionBy(col("q_id"), col("pid")).orderBy(cos.desc, col("c_id"))
    val w2 = Window.partitionBy(col("q_id")).orderBy(cos.desc, col("c_id"))
    scored
      .withColumn("prn", row_number().over(w1)).filter(col("prn") <= k)
      .withColumn("rn", row_number().over(w2)).filter(col("rn") <= k)
      .select(col("q_id"), col("c_id"), col("rn"), TextFunctions.round4(cos).as("cos"))
  }

  /** HARD-NEGATIVE MINING for contrastive training: per anchor, the k
    * nearest candidates with a DIFFERENT label — the "confusable but
    * wrong" examples that make contrastive losses work (the curated
    * complement of [[Sampling.negativeSample]]'s uniform draws). Same
    * two-phase top-k as [[bruteForceTopK]] (anchors broadcast past the
    * corpus, per-(anchor, partition) heaps, bounded merge) with the
    * label-exclusion predicate riding the broadcast join; at corpus
    * scale the ANN family supplies candidates instead of the brute
    * scan, exactly as documented there. */
  def hardNegatives(emb: DataFrame, idCol: String, vecCol: String, labelCol: String,
      k: Int, anchorPred: org.apache.spark.sql.Column): DataFrame = {
    val base = emb.filter(VectorFunctions.norm(col(vecCol)) > 0)
    val q = base.filter(anchorPred)
      .select(col(idCol).as("q_id"), col(vecCol).as("qv"), col(labelCol).as("q_lbl"))
    val c = base.select(col(idCol).as("c_id"), col(vecCol).as("cv"), col(labelCol).as("c_lbl"))
    val cos = VectorFunctions.cosine(col("qv"), col("cv"))
    val scored = broadcast(q).join(c, col("q_lbl") =!= col("c_lbl"))
      .withColumn("pid", spark_partition_id())
    val w1 = Window.partitionBy(col("q_id"), col("pid")).orderBy(cos.desc, col("c_id"))
    val w2 = Window.partitionBy(col("q_id")).orderBy(cos.desc, col("c_id"))
    scored
      .withColumn("prn", row_number().over(w1)).filter(col("prn") <= k)
      .withColumn("rn", row_number().over(w2)).filter(col("rn") <= k)
      .select(col("q_id"), col("c_id"), col("rn"), TextFunctions.round4(cos).as("cos"))
  }

  /** LSH-bucketed top-k: identical contract to [[bruteForceTopK]] but
    * only candidates sharing the query's hyperplane bucket are scored —
    * queries whose bucket holds fewer than k neighbors return fewer
    * rows, and true neighbors in other buckets are missed (recall<1). */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      planes: Int, queryPred: org.apache.spark.sql.Column): DataFrame = {
    val bucketed = emb.filter(VectorFunctions.norm(col(vecCol)) > 0)
      .select(col(idCol), col(vecCol),
        VectorFunctions.hyperplaneBucket(col(vecCol), planes).as("bucket"))
    val q = bucketed.filter(queryPred).select(col(idCol).as("q_id"), col(vecCol).as("qv"), col("bucket"))
    val c = bucketed.select(col(idCol).as("c_id"), col(vecCol).as("cv"), col("bucket"))
    val cos = VectorFunctions.cosine(col("qv"), col("cv"))
    val w = Window.partitionBy(col("q_id")).orderBy(cos.desc, col("c_id"))
    q.join(c, Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("c_id"), col("rn"), TextFunctions.round4(cos).as("cos"))
  }

  /** MULTI-PROBE LSH top-k: [[lshTopK]] plus probing every bucket at
    * Hamming distance 1 from the query's own (flip each of the `planes`
    * sign bits) — the standard recall lever for hyperplane LSH: a near
    * neighbor that fell on the far side of ONE hyperplane is recovered,
    * at (planes+1)× the candidate-join fanout and zero extra hash
    * evaluations or index structures. The candidate set strictly
    * contains the single-probe set, so per-query best cosine can only
    * improve (spec-asserted). Scale shape unchanged: bucket equi-join,
    * probes generated by a narrow map on the (tiny) query side. */
  def lshTopKMultiProbe(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      planes: Int, queryPred: org.apache.spark.sql.Column): DataFrame = {
    val bucketed = emb.filter(VectorFunctions.norm(col(vecCol)) > 0)
      .select(col(idCol), col(vecCol),
        VectorFunctions.hyperplaneBucket(col(vecCol), planes).as("bucket"))
    // the query's own bucket + each one-bit flip; all planes+1 probe
    // values are distinct, and a candidate has exactly one bucket, so
    // the probe join can never duplicate a (query, candidate) pair
    val flips = (0 until planes).map { p =>
      concat(substring(col("bucket"), 1, p),
        when(substring(col("bucket"), p + 1, 1) === "0", lit("1")).otherwise(lit("0")),
        substring(col("bucket"), p + 2, planes - p - 1))
    }
    val q = bucketed.filter(queryPred)
      .select(col(idCol).as("q_id"), col(vecCol).as("qv"),
        explode(array(col("bucket") +: flips: _*)).as("bucket"))
    val c = bucketed.select(col(idCol).as("c_id"), col(vecCol).as("cv"), col("bucket"))
    val cos = VectorFunctions.cosine(col("qv"), col("cv"))
    val w = Window.partitionBy(col("q_id")).orderBy(cos.desc, col("c_id"))
    q.join(c, Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("c_id"), col("rn"), TextFunctions.round4(cos).as("cos"))
  }

  /** IVF-style top-k: vectors are assigned to their nearest centroid
    * (inverted file lists), and each query searches only the `nProbe`
    * centroids nearest to it. Centroids here are a deterministic subset
    * of the corpus (`centroidPred`) so the oracle can reproduce them; a
    * production build would k-means them — the dataflow (assign via
    * broadcast centroid join → probe-list equi-join → score within
    * lists) is identical. Recall < 1 by design; candidates outside the
    * probed lists are never scored. */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int, centroidPred: org.apache.spark.sql.Column,
      queryPred: org.apache.spark.sql.Column): DataFrame = {
    val nonZero = emb.filter(VectorFunctions.norm(col(vecCol)) > 0)
    val cent = nonZero.filter(centroidPred)
      .select(col(idCol).as("cent_id"), col(vecCol).as("centv"))
    val assigned = assignToCentroids(nonZero, idCol, vecCol, cent)
    // probe lists: every query → its nProbe nearest centroids
    val probes = nonZero.filter(queryPred).select(col(idCol).as("q_id"), col(vecCol).as("qv"))
      .join(broadcast(cent))
      .withColumn("prn", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(VectorFunctions.cosine(col("qv"), col("centv")).desc, col("cent_id"))))
      .filter(col("prn") <= nProbe)
      .select(col("q_id"), col("qv"), col("cent_id"))
    val qcos = VectorFunctions.cosine(col("qv"), col("v"))
    val wTop = Window.partitionBy(col("q_id")).orderBy(qcos.desc, col("vid"))
    probes.join(assigned, Seq("cent_id"))
      .filter(col("q_id") =!= col("vid"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vid").as("c_id"), col("rn"), TextFunctions.round4(qcos).as("cos"))
  }

  /** Production IVF: centroids learned with MLlib k-means (seeded),
    * then the same assign → probe → score dataflow as [[ivfTopK]]. Not
    * oracle-checkable (k-means isn't reproducible in SQL), hence the
    * rows-only query entry.
    *
    * The fit is bounded by design: centroids train on at most
    * `trainCap` vectors (`limit` short-circuits the scan; at 100 TB the
    * index quality of a few-hundred-centroid codebook saturates long
    * before 100k training points), the training set is cached so the
    * `maxIter` Lloyd passes don't rescan parquet, and init is `random`
    * rather than k-means|| (whose init alone is ~5 more distributed
    * passes — pointless for a codebook this small). Only the single
    * `transform` assignment pass touches the full corpus. */
  def ivfKMeansTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int, nCentroids: Int, queryPred: org.apache.spark.sql.Column,
      seed: Long = 42L, trainCap: Int = 100000, maxIter: Int = 10): DataFrame =
    ivfSearchSpherical(emb, idCol, vecCol, k, nProbe,
      ivfKMeansFit(emb, vecCol, nCentroids, seed, trainCap, maxIter), queryPred)

  /** The k-means codebook fit alone (driver-local over a capped
    * sample, [[LocalKMeans]]) — exposed so q45 can feed the SAME
    * frozen centers to both search spellings and gate bit-equality. */
  def ivfKMeansFit(emb: DataFrame, vecCol: String, nCentroids: Int,
      seed: Long = 42L, trainCap: Int = 100000, maxIter: Int = 10): Array[Array[Double]] = {
    val sample = LocalKMeans.sample(emb, vecCol, trainCap, unit = true)
    LocalKMeans.fit(sample, 0, sample.head.length, nCentroids, seed, maxIter)
  }

  /** Spherical IVF search against FROZEN centers. Clusters were fit on
    * UNIT vectors so Euclidean ordering agrees with cosine (spherical
    * k-means); assignment and probe both use that Euclidean-on-unit
    * metric — a cosine probe against non-unit centroids would rank
    * different lists than the assignment map filled. Assignment is ONE
    * narrow map with the centroid matrix as a plan constant (native
    * [[graft.plans.VectorExprs.NearestCentroidExpr]]) — no join, no
    * shuffle on the corpus side. */
  def ivfSearchSpherical(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, nProbe: Int, centers: Array[Array[Double]],
      queryPred: org.apache.spark.sql.Column): DataFrame = {
    def unit(c: org.apache.spark.sql.Column) =
      transform(c, x => x.cast("double") / VectorFunctions.norm(c))
    val assigned = emb.filter(VectorFunctions.norm(col(vecCol)) > 0)
      .select(col(idCol).as("vid"), col(vecCol).as("v"))
      .withColumn("cent_id", LocalKMeans.nearestCentId(unit(col("v")), centers))
    val centDf = LocalKMeans.centersDf(emb.sparkSession, centers)
    val dist2 = aggregate(
      zip_with(unit(col("qv")), col("centv"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
    val probes = emb.filter(queryPred && VectorFunctions.norm(col(vecCol)) > 0)
      .select(col(idCol).as("q_id"), col(vecCol).as("qv"))
      .join(broadcast(centDf))
      .withColumn("prn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(dist2.asc, col("cent_id"))))
      .filter(col("prn") <= nProbe)
      .select("q_id", "qv", "cent_id")
    val qcos = VectorFunctions.cosine(col("qv"), col("v"))
    val wTop = Window.partitionBy(col("q_id")).orderBy(qcos.desc, col("vid"))
    probes.join(assigned, Seq("cent_id"))
      .filter(col("q_id") =!= col("vid"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vid").as("c_id"), col("rn"), TextFunctions.round4(qcos).as("cos"))
  }

  /** CROSS-CHECK TWIN of [[ivfSearchSpherical]] — the generic
    * fixed-centroid spelling (broadcast centroid JOIN + struct-min
    * argmin AGGREGATE over the composed HOF distance), sharing NO
    * assignment code with the native-kernel path. Given the same
    * frozen centers the two spellings must agree BIT-FOR-BIT: the
    * HOF `aggregate(zip_with(...))` sums squared diffs left-to-right
    * exactly like the native loop (same IEEE adds, same order), and
    * both tie-break argmin to the lowest cent_id. q45's
    * `ivf_eq_fixed` gate rides on that — the q155 "two constructions,
    * one answer" idiom for the path a SQL oracle can't reach. */
  def ivfSearchSphericalTwin(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, nProbe: Int, centers: Array[Array[Double]],
      queryPred: org.apache.spark.sql.Column): DataFrame = {
    def unit(c: org.apache.spark.sql.Column) =
      transform(c, x => x.cast("double") / VectorFunctions.norm(c))
    def d2(u: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =
      aggregate(zip_with(u, c, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
    val centDf = LocalKMeans.centersDf(emb.sparkSession, centers)
    val nonZero = emb.filter(VectorFunctions.norm(col(vecCol)) > 0)
    val assigned = nonZero
      .select(col(idCol).as("vid"), col(vecCol).as("v"))
      .join(broadcast(centDf))
      .select(col("vid"), col("v"),
        struct(d2(unit(col("v")), col("centv")).as("dd"), col("cent_id")).as("sc"))
      .groupBy("vid")
      .agg(first(col("v")).as("v"), min(col("sc")).as("m"))
      .select(col("vid"), col("v"), col("m").getField("cent_id").as("cent_id"))
    val probes = nonZero.filter(queryPred)
      .select(col(idCol).as("q_id"), col(vecCol).as("qv"))
      .join(broadcast(centDf))
      .withColumn("prn", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(d2(unit(col("qv")), col("centv")).asc, col("cent_id"))))
      .filter(col("prn") <= nProbe)
      .select("q_id", "qv", "cent_id")
    val qcos = VectorFunctions.cosine(col("qv"), col("v"))
    val wTop = Window.partitionBy(col("q_id")).orderBy(qcos.desc, col("vid"))
    probes.join(assigned, Seq("cent_id"))
      .filter(col("q_id") =!= col("vid"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vid").as("c_id"), col("rn"), TextFunctions.round4(qcos).as("cos"))
  }

  /** Inverted-list assignment: every vector → its single nearest
    * centroid by cosine. argmax as a struct-min AGGREGATE, not a
    * window: partial aggregation combines the |V|×|C| scored rows
    * map-side, so only one row per vector reaches the shuffle (a
    * window would sort and shuffle the full cross product).
    * min(struct(-cs, cent_id)) picks the highest score, ties to the
    * LOWEST centroid id — identical to row_number over
    * (cs DESC, cent_id ASC) = 1 — negating the DOUBLE score, so
    * cent_id may be any orderable type. Requires unique ids (like
    * every idCol contract here): duplicate vids would pair one row's
    * vector with another's argmax centroid.
    * negation is not order-reversing for NaN (both engines sort NaN as
    * GREATEST, so under cs DESC a NaN score wins); map it to -Inf so
    * the struct-min picks it first, exactly like the row_number form.
    * Output: (vid, v, cent_id). */
  private def assignToCentroids(nonZero: DataFrame, idCol: String,
      vecCol: String, cent: DataFrame): DataFrame = {
    val cos = VectorFunctions.cosine(col("v"), col("centv"))
    val negcs = when(isnan(cos), lit(Double.NegativeInfinity)).otherwise(-cos)
    nonZero.select(col(idCol).as("vid"), col(vecCol).as("v"))
      .join(broadcast(cent))
      .select(col("vid"), col("v"), struct(negcs.as("negcs"), col("cent_id")).as("sc"))
      .groupBy("vid")
      .agg(first(col("v")).as("v"), min(col("sc")).as("m"))
      .select(col("vid"), col("v"), col("m").getField("cent_id").as("cent_id"))
  }

  /** SemDeDup-style SEMANTIC DEDUPLICATION (Abbas et al. 2023,
    * arXiv:2303.09540): coarse-cluster the embedding space, compare
    * vectors only WITHIN their cluster, union near-duplicate pairs
    * (cosine ≥ theta) into connected components, and elect the
    * smallest id of each component as its representative. Rows with
    * `vec_id != rep_id` are the semantic duplicates a curation
    * pipeline drops.
    *
    * Scale shape: centroids broadcast (one narrow assignment pass over
    * the corpus — the struct-min argmax of [[assignToCentroids]]),
    * pair generation is an equi-join on cent_id (never all-pairs), CC
    * is the O(log n) per-round equi-join fixpoint of
    * [[Dedup.dedupClusters]]. The quadratic term is per-cluster
    * fanout, bounded by the coarse-cluster size — at 100 TB you raise
    * the centroid count so clusters stay bounded (SemDeDup used 11k
    * clusters for 1.3 B embeddings) and feed k-means centroids
    * ([[ivfKMeansTopK]]'s fit) instead of the deterministic subset the
    * oracle needs.
    *
    * Centroids are `centroidPred` rows of the corpus itself (same
    * contract as [[ivfTopK]]) so DuckDB can replay the whole pipeline:
    * assignment, pair filter (on the round-4 score, making the theta
    * cut engine-stable), and CC via recursive CTE.
    * Output: (vec_id, cent_id, rep_id, is_dup ∈ {0,1}). */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
      centroidPred: org.apache.spark.sql.Column, theta: Double): DataFrame = {
    val nonZero = emb.filter(VectorFunctions.norm(col(vecCol)) > 0)
    val cent = nonZero.filter(centroidPred)
      .select(col(idCol).as("cent_id"), col(vecCol).as("centv"))
    val assigned = assignToCentroids(nonZero, idCol, vecCol, cent)
    val pairs = nearDupPairs(assigned, "vid", "v", "cent_id", theta)
    // dedupClusters' output contract is (doc_id, cluster_id) regardless
    // of the input id name — re-alias to this domain's (vid, rep_id)
    Dedup.dedupClusters(pairs.select("id_a", "id_b"), assigned.select("vid"))
      .select(col("doc_id").as("vid"), col("cluster_id").as("rep_id"))
      .join(assigned.select(col("vid"), col("cent_id")), Seq("vid"))
      .select(col("vid").as("vec_id"), col("cent_id"), col("rep_id"),
        (col("vid") =!= col("rep_id")).cast("int").as("is_dup"))
  }

  /** The PRODUCTION path of [[semanticDedup]]: identical pipeline
    * (assign → within-cluster pairs → connected components → smallest-id
    * representative) but the coarse clusters are learned with seeded
    * MLlib k-means (spherical: fit on unit vectors, same rationale as
    * [[ivfKMeansTopK]]) instead of the oracle's deterministic
    * corpus-subset centroids. Not SQL-reproducible, hence rows-only;
    * the declared query self-gates on two properties instead:
    * blocked duplicates are a SUBSET of the exact all-pairs closure's
    * duplicates (blocking can only drop edges, and dropping edges can
    * only shrink the reachable-smaller-id set — a deterministic
    * invariant), and recall against that closure clears a floor.
    *
    * `nCentroids` is the 100 TB knob: per-cluster pair fanout is
    * Σ C(n_i, 2), so centroids should grow ∝ corpus size to hold the
    * per-vector pair volume constant (SemDeDup's 11 k clusters / 1.3 B
    * embeddings ≈ 120 k vectors per cluster); the committed
    * SemanticDedupBench record measures exactly that curve. */
  def semanticDedupKMeans(emb: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, theta: Double, seed: Long = 42L,
      trainCap: Int = 100000, maxIter: Int = 10): DataFrame = {
    val assigned = assignKMeans(emb, idCol, vecCol, nCentroids, seed, trainCap, maxIter)
    val pairs = nearDupPairs(assigned, "vid", "v", "cent_id", theta)
    Dedup.dedupClusters(pairs.select("id_a", "id_b"), assigned.select("vid"))
      .select(col("doc_id").as("vid"), col("cluster_id").as("rep_id"))
      .join(assigned.select(col("vid"), col("cent_id")), Seq("vid"))
      .select(col("vid").as("vec_id"), col("cent_id"), col("rep_id"),
        (col("vid") =!= col("rep_id")).cast("int").as("is_dup"))
  }

  /** THE production entry for semantic dedup at scale:
    * [[semanticDedupKMeans]] with the centroid count DERIVED as
    * c = ⌈N / targetClusterSize⌉ — the SemDeDup regime (11 k clusters
    * over 1.3 B embeddings ≈ 120 k/cluster). Holding the TARGET
    * CLUSTER SIZE fixed while the corpus grows keeps the per-vector
    * pair fanout Σ C(n_i, 2)/N ≈ targetClusterSize/2 CONSTANT across
    * corpus decades — the committed SemanticDedupBench record measures
    * pairs/vec 68→71→80 over a 100× corpus sweep under exactly this
    * rule. q79 (fixed corpus-subset centroids) is the ORACLE GATE for
    * the shared pipeline, not the production path; q79b runs this
    * code. */
  def semanticDedupKMeansScaled(emb: DataFrame, idCol: String, vecCol: String,
      targetClusterSize: Long, theta: Double, seed: Long = 42L,
      trainCap: Int = 100000, maxIter: Int = 10): DataFrame = {
    require(targetClusterSize >= 1, s"targetClusterSize must be >= 1")
    val n = emb.filter(VectorFunctions.norm(col(vecCol)) > 0).count()
    val c = math.max(1L, (n + targetClusterSize - 1) / targetClusterSize)
    require(c <= Int.MaxValue, "centroid count overflow")
    semanticDedupKMeans(emb, idCol, vecCol, c.toInt, theta, seed, trainCap, maxIter)
  }

  /** Seeded spherical k-means assignment: (vid, v, cent_id). Fit is
    * bounded exactly like [[ivfKMeansTopK]]'s (capped cached training
    * sample, random init, few Lloyd passes); only the single transform
    * pass touches the full corpus. */
  private[graft] def assignKMeans(emb: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, seed: Long, trainCap: Int, maxIter: Int): DataFrame = {
    def unit(c: org.apache.spark.sql.Column) =
      transform(c, x => x.cast("double") / VectorFunctions.norm(c))
    val sample = LocalKMeans.sample(emb, vecCol, trainCap, unit = true)
    val centers = LocalKMeans.fit(
      sample, 0, sample.head.length, nCentroids, seed, maxIter)
    emb.filter(VectorFunctions.norm(col(vecCol)) > 0)
      .select(col(idCol).as("vid"), col(vecCol).as("v"))
      .withColumn("cent_id", LocalKMeans.nearestCentId(unit(col("v")), centers))
  }

  /** Embedding near-duplicate pairs within a blocking bucket (e.g. a
    * cluster/label column or an LSH bucket): all same-bucket pairs with
    * cosine ≥ theta. Blocking keeps the pair space linear-ish; at scale
    * feed an LSH bucket, never a constant. */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      bucketCol: String, theta: Double): DataFrame = {
    val nz = emb.filter(VectorFunctions.norm(col(vecCol)) > 0)
    val a = nz.select(col(bucketCol).as("bucket"), col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = nz.select(col(bucketCol).as("bucket"), col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", TextFunctions.round4(VectorFunctions.cosine(col("va"), col("vb"))))
      .filter(col("cos") >= theta)
      .select("id_a", "id_b", "cos")
  }

  /** Exact ALL-PAIRS cosine ≥ theta over one whole (small) vector set —
    * the oracle-gate leg of q79b (the recursive-CTE-replayed exact
    * closure the k-means path is judged against). r15 optimization:
    * spelled as [[nearDupPairs]] over a constant bucket, the equi-join
    * hashes EVERY row to one partition and the n²/2 cosine evaluations
    * run on one core (guide §2.5 — a single enormous key is exactly the
    * skew AQE cannot split); here the (tiny) set broadcasts and the
    * stream side is parallelism-rebalanced, so the same pairs evaluate
    * across every core with zero exchanges. Identical rows by
    * construction (same id_a < id_b, same round-4 cosine, same theta
    * cut). Past `maxRows` it degrades to the bucket join — all-pairs at
    * that size is the caller's (documented, oracle-mandated) problem,
    * and the broadcast must never be the thing that OOMs first. */
  def allPairsCosine(emb: DataFrame, idCol: String, vecCol: String,
      theta: Double, maxRows: Long = 250000L): DataFrame = {
    val nz = emb.filter(VectorFunctions.norm(col(vecCol)) > 0)
      .select(col(idCol), col(vecCol))
    val probe = nz.select(col(idCol)).limit((maxRows + 1).toInt).count()
    if (probe > maxRows)
      return nearDupPairs(nz.withColumn("__whole", lit(1)), idCol, vecCol,
        "__whole", theta)
    val a = graft.sources.Balance.cpuBound(nz)
      .select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = nz.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    def cos = TextFunctions.round4(VectorFunctions.cosine(col("va"), col("vb")))
    a.join(broadcast(b), col("id_a") < col("id_b") && cos >= theta)
      .select(col("id_a"), col("id_b"), cos.as("cos"))
  }

  /** Centroid-based (simplified) SILHOUETTE — the clustering-quality
    * gauge for the coarse-cluster stages ([[semanticDedup]], IVF): per
    * vector, a = cosine distance to its NEAREST centroid, b = distance
    * to the SECOND-nearest, s = (b−a)/max(a,b) ∈ [0,1] — near 1 means
    * tight, well-separated clusters; near 0 means the vector sits on a
    * cluster boundary and the coarse blocking is cutting real
    * neighborhoods. (The classic pairwise silhouette is O(n²); the
    * centroid form is the standard linear-time surrogate.)
    *
    * Exactness: each per-row s is one fixed double expression over the
    * in-order dot products (bit-equal across engines, like every
    * cosine in this file), quantized per row to 1e-6 units — so the
    * per-cluster and overall means are exact BIGINT sums with one
    * round4 division at the end, no cross-row float accumulation
    * order.
    *
    * Scale shape: centroids broadcast; top-2 ranking is a per-vector
    * bounded heap (rn ≤ 2 plans as TopKPerKeyExec); then one
    * cluster-count-sized aggregation + a 1-row overall attach.
    * Centroids follow the [[ivfTopK]] contract (a `centroidPred`
    * subset of the corpus) so DuckDB replays the whole computation.
    *
    * @return one row per cluster: cent_id, n, avg_sil, plus the
    *         corpus-level overall_sil repeated (1-row scalar attach)
    */
  def centroidSilhouette(emb: DataFrame, idCol: String, vecCol: String,
      centroidPred: org.apache.spark.sql.Column): DataFrame = {
    val nonZero = emb.filter(VectorFunctions.norm(col(vecCol)) > 0)
    val cent = nonZero.filter(centroidPred)
      .select(col(idCol).as("cent_id"), col(vecCol).as("centv"))
    val cs = VectorFunctions.cosine(col("v"), col("centv"))
    val w = Window.partitionBy("vid").orderBy(col("cs").desc, col("cent_id"))
    val ranked = nonZero.select(col(idCol).as("vid"), col(vecCol).as("v"))
      .join(broadcast(cent))
      .select(col("vid"), col("cent_id"), cs.as("cs"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
    val top2 = ranked.groupBy("vid").agg(
      max(when(col("rn") === 1, struct(col("cs"), col("cent_id")))).as("c1"),
      max(when(col("rn") === 2, col("cs"))).as("cs2"))
    val a = lit(1.0d) - col("c1").getField("cs")
    val b = lit(1.0d) - col("cs2")
    val sil = when(greatest(a, b) > 0d, (b - a) / greatest(a, b)).otherwise(lit(0.0d))
    val units = top2
      .filter(col("cs2").isNotNull) // needs >= 2 centroids to rank against
      .select(col("c1").getField("cent_id").as("cent_id"),
        floor(sil * 1e6 + 0.5d).cast("long").as("su"))
    val byc = units.groupBy("cent_id")
      .agg(count(lit(1)).as("n"), sum(col("su")).as("_su"))
    val tot = byc.agg(sum(col("n")).as("_tn"), sum(col("_su")).as("_ts"))
    byc.crossJoin(broadcast(tot))
      .select(col("cent_id"), col("n"),
        TextFunctions.round4(col("_su").cast("double") /
          (col("n").cast("double") * 1e6)).as("avg_sil"),
        TextFunctions.round4(col("_ts").cast("double") /
          (col("_tn").cast("double") * 1e6)).as("overall_sil"))
  }
}
