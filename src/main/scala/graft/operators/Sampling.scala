package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling without replacement — the
  * importance-sampling primitive a training-data pipeline runs to carve
  * a token-budget-proportional (or quality-proportional) subset out of
  * a corpus snapshot.
  *
  * Algorithm: Efraimidis–Spirakis A-ES (Inf. Process. Lett. 97(5),
  * 2006). Each row draws u ∈ (0,1) and the k rows with the largest
  * u^(1/w) are the weighted sample — inclusion probability is
  * proportional to the weight, and the selection is a single top-k
  * pass, no sequential reservoir needed.
  *
  * Properties that matter at 100 TB (mirrors [[Splits]]):
  *
  *  - **Deterministic.** u is a pure function of the row id (md5-prefix
  *    bucket — the repo's engine-portable idiom), never of row order,
  *    partitioning, or a driver-held seed. The same corpus snapshot
  *    yields the same sample in any engine, so the DuckDB oracle checks
  *    every selection exactly.
  *  - **Narrow + top-k.** One codegen'd projection computes the key;
  *    selection is `orderBy(key).limit(k)` which Spark plans as
  *    TakeOrderedAndProject — per-partition bounded heaps merged on the
  *    driver, no global sort, no shuffle of the corpus.
  *  - **Underflow-safe.** The key is ranked as ln(u)/w, the monotone
  *    log transform of u^(1/w) — with document-sized weights (w in the
  *    thousands) the direct pow form collapses into the denormal range
  *    and ties everything at 1.0-ε; the log form stays in a well-spread
  *    negative band.
  *
  * The ranked key is floor-rounded to 8 dp before the cutoff (the
  * repo's engine-exact ranking idiom: libm vs JVM `log` may differ in
  * the last ulp; a rounded key with an id tie-break makes the cut
  * identical across engines).
  */
object Sampling {

  /** ln(u)/w with u = (md5-bucket(id)+1)/65537 ∈ (0,1); w must be > 0. */
  def esKey(id: Column, weight: Column): Column =
    log((Splits.hashBucket(id) + 1).cast("double") / 65537.0) / weight

  /** The rounded ranking key actually used for the cutoff. */
  def esKeyRounded(id: Column, weight: Column): Column =
    floor(esKey(id, weight) * 1e8 + 0.5) / 1e8

  /** Global weighted sample: the k rows with the largest keys, with an
    * id tie-break. Plans as TakeOrderedAndProject (no global sort). */
  def weightedSample(df: DataFrame, idCol: String, weight: Column, k: Int): DataFrame =
    df.withColumn("es_key", esKeyRounded(col(idCol), weight))
      .orderBy(col("es_key").desc, col(idCol))
      .limit(k)

  /** Mergeable bounded weighted-sample SKETCH: the A-ES top-k as a
    * typed Aggregator whose state is at most k (key, id) pairs — the
    * form that drops into a STREAMING aggregate (Complete mode) or any
    * partial-aggregation context and keeps the exact same sample as
    * the batch [[weightedSample]] (spec-asserted stream == batch).
    * A-ES keys make a weighted sample order-insensitive: the k largest
    * keys of a union are the k largest of the merged parts, so the
    * sketch is mergeable in the PODS'12 sense (like [[HeavyHitters]]'
    * Misra–Gries) and the state crossing the shuffle is k pairs, not
    * the stream. */
  class BoundedSampleSketch(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Long]] {
    require(k > 0, s"need k > 0, got $k")
    // weightedSample's total order: key DESC, id ASC
    private def best(v: Seq[(Double, Long)]): Seq[(Double, Long)] =
      v.sortBy(t => (-t._1, t._2)).take(k)
    def zero: Seq[(Double, Long)] = Vector.empty
    def reduce(s: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] = best(s :+ x)
    def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = best(a ++ b)
    def finish(s: Seq[(Double, Long)]): Seq[Long] = best(s).map(_._2)
    def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** One-row DataFrame (`sample_ids`: the k sampled ids, best first)
    * via the sketch — usable identically on a batch frame or a
    * streaming frame in Complete mode. */
  def weightedSampleSketch(df: DataFrame, idCol: String, weight: Column, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(esKeyRounded(col(idCol), weight).as("k"), col(idCol).as("id"))
      .as[(Double, Long)]
    keyed.select(new BoundedSampleSketch(k).toColumn.name("sample_ids")).toDF()
  }

  /** Temperature-based mixture sampling — the α-mixing of multilingual
    * / multi-source LLM data recipes (sampling share ∝ n_g^α; α < 1
    * flattens the mixture toward low-resource groups, α = 1 is
    * proportional, α = 0 uniform). Produces ⌊budget·w_g/Σw⌋ rows per
    * group (capped at the group size), selected in the deterministic
    * md5 order.
    *
    * Determinism contract: n_g^α is floor-scaled to an exact integer of
    * 1e-6 units and the allocation uses integer division, so the split
    * is reproducible bit-for-bit in any engine (no float-sum or
    * division-rounding hazard — the only float op is the single pow per
    * group). Plan shape: one count aggregate (groups are few — the
    * allocation table broadcasts), one md5-rank window per group.
    * Floor allocation means Σ alloc ≤ budget (never over); the
    * remainder is deliberately NOT redistributed — redistribution
    * rules are a policy choice callers layer on top. */
  def temperatureMix(df: DataFrame, idCol: String, groupCol: String,
      alpha: Double, budget: Long): DataFrame = {
    require(alpha >= 0 && budget > 0, s"need alpha >= 0 and budget > 0")
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("n_g"))
      .withColumn("w6",
        floor(pow(col("n_g").cast("double"), alpha) * 1e6 + 0.5).cast("long"))
    val alloc = counts
      .crossJoin(broadcast(counts.agg(sum(col("w6")).as("sw"))))
      .withColumn("alloc", least(col("n_g"), expr(s"($budget * w6) div sw")))
      .select(groupCol, "n_g", "alloc")
    // two-phase rank (bruteForceTopK's pattern): groups are FEW (that
    // is the operator's regime — languages, sources), so a single
    // per-group window would funnel the whole corpus into |groups|
    // tasks. Phase 1 keeps ≤ budget rows per (group, input partition) —
    // sound because every group's allocation is ≤ budget by
    // construction — and the global rank then orders ≤ budget × input
    // partitions survivors per group, never the full group.
    val bucket = Splits.hashBucket(col(idCol))
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol), col("__pid"))
      .orderBy(bucket, col(idCol))
    val wGlobal = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(bucket, col(idCol))
    df.withColumn("__pid", spark_partition_id())
      .withColumn("__prn", row_number().over(wLocal))
      .filter(col("__prn") <= budget)
      .withColumn("rn", row_number().over(wGlobal))
      .join(broadcast(alloc), Seq(groupCol))
      .filter(col("rn") <= col("alloc"))
      .drop("__pid", "__prn")
  }

  /** UniMax-style EPOCH-AWARE mixing WITH REPLACEMENT (Chung et al.,
    * "UniMax", ICLR'23 shape): each group (language/source) gets an
    * equal share of the total token budget, CAPPED at `maxEpochs`
    * passes over the group's own tokens — the repetition-budgeting
    * step multilingual recipes run where q97's temperature mix does
    * selection WITHOUT replacement. Returns per-doc `n_copies`: full
    * epochs for everyone, plus one extra copy for the deterministic
    * md5-ordered prefix of docs that fills the remainder (a doc whose
    * START offset is inside the remainder counts as a copy — the
    * truncation convention, stated, not hidden).
    *
    * Exactness: budgets, epoch counts and remainders are pure integer
    * arithmetic (`div`/`-`), and the remainder prefix comes from an
    * integer running token total — bit-reproducible in any engine.
    *
    * Scale shape: the running total is [[GlobalIds.prefixSumBy]] (ONE
    * range exchange + broadcast per-(partition, group) offsets + a
    * narrow map) — NOT a per-group window, which would funnel each
    * group's corpus-sized slice into one task in exactly this
    * operator's few-groups regime. The allocation table is
    * groups-sized and broadcasts. */
  def epochMix(docs: DataFrame, idCol: String, groupCol: String, tokens: Column,
      totalBudget: Long, maxEpochs: Int, numParts: Int = 32): DataFrame = {
    require(totalBudget > 0 && maxEpochs >= 1,
      s"need totalBudget > 0 and maxEpochs >= 1, got $totalBudget / $maxEpochs")
    val base = docs
      .select(col(idCol).as("doc_id"), col(groupCol).as("grp"), tokens.cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("ord", md5(col("doc_id").cast("string")))
    val cum = GlobalIds.prefixSumBy(base, "grp", "n_tok", "cum", numParts,
      col("ord"), col("doc_id"))
    // group totals from the prefix sum's PINNED output, not from `base`:
    // prefixSumBy localCheckpoints its input, so this (and the ng
    // aggregate below) rescans materialized blocks instead of
    // re-evaluating the caller's upstream chain — which may be an
    // expensive gate (q128 runs the hashed classifier there; deriving
    // totals from `base` re-ran it once per consumer, 9.2 s vs 2.6 s)
    val groups = cum.groupBy("grp").agg(sum("n_tok").as("g_tok"))
    val alloc = groups
      .crossJoin(broadcast(groups.agg(count(lit(1)).as("ng"))))
      .withColumn("budget",
        least(lit(maxEpochs).cast("long") * col("g_tok"), expr(s"$totalBudget div ng")))
      .withColumn("e", expr("budget div g_tok"))
      .withColumn("rem", col("budget") - col("e") * col("g_tok"))
      .select("grp", "e", "rem")
    cum.join(broadcast(alloc), "grp")
      .withColumn("n_copies",
        col("e") + when(col("cum") - col("n_tok") < col("rem"), 1L).otherwise(0L))
      .select(col("grp"), col("doc_id"), col("n_tok"), col("n_copies"))
  }

  /** Per-stratum weighted sample: k rows per distinct value of
    * `stratumCol` (e.g. per language). Two-phase rank — strata are FEW
    * in this operator's regime, so a single per-stratum window would
    * route the whole corpus into |strata| tasks; phase 1 keeps ≤ k rows
    * per (stratum, input partition) spread across the cluster, and the
    * global rank orders only the bounded survivors. Both rank filters
    * plan as the bounded-heap TopKPerKeyExec (no sort — spec-asserted). */
  def weightedSamplePerStratum(df: DataFrame, idCol: String, stratumCol: String,
      weight: Column, k: Int): DataFrame = {
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol), col("__pid"))
      .orderBy(col("es_key").desc, col(idCol))
    val wGlobal = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(col("es_key").desc, col(idCol))
    df.withColumn("es_key", esKeyRounded(col(idCol), weight))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__prn", row_number().over(wLocal))
      .filter(col("__prn") <= k)
      .withColumn("rn", row_number().over(wGlobal))
      .filter(col("rn") <= k)
      .drop("rn", "__pid", "__prn")
  }

  /** DETERMINISTIC NEGATIVE SAMPLING (contrastive-training data): k
    * uniform pseudo-random negatives per anchor, drawn WITHOUT any
    * cross join, shuffle of the corpus by value, or driver-held RNG.
    *
    * Scheme: dense ids 1..N via [[GlobalIds]] (one range exchange),
    * then negative j of anchor a is the row whose dense id is
    * `1 + (md5-bucket(a + "#" + j) mod N)` — a pure function of
    * (anchor, j), so draws are reproducible anywhere, independent of
    * partitioning, and engine-portable (the [[Splits]] bucket
    * arithmetic). A draw that hits the anchor itself moves to the
    * cyclically-next id. Fetching negatives is ONE hash equi-join on
    * the dense id; the anchor×k fan-out is a narrow explode.
    *
    * Uniformity is bucket-quantized (65536 mod N bias — negligible for
    * N ≪ 65536 per draw); true negatives (label-aware filtering) are
    * the caller's join to apply afterwards. */
  def negativeSample(df: DataFrame, idCol: String, k: Int,
      numParts: Int = 32): DataFrame = {
    require(k > 0)
    val ids = GlobalIds.assign(df.select(col(idCol)).distinct(), "_gid",
      numParts, col(idCol))
    val n = ids.agg(max("_gid")).head.getLong(0) // scalar (= distinct count)
    require(n >= 2, "need at least two ids to draw negatives")
    val drawn = ids
      .select(col(idCol).as("anchor"), col("_gid").as("ag"))
      .withColumn("j", explode(sequence(lit(1), lit(k))))
      .withColumn("ng_raw",
        lit(1L) + Splits.hashBucket(concat(col("anchor"), lit("#"), col("j"))).cast("long") % n)
      .withColumn("ng",
        when(col("ng_raw") === col("ag"), col("ag") % n + 1).otherwise(col("ng_raw")))
    drawn
      .join(ids.select(col(idCol).as("neg_id"), col("_gid").as("ng")), "ng")
      .select(col("anchor"), col("j"), col("neg_id"))
  }
}
