package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Splits.hashBucket

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023): select raw-corpus documents whose hashed-n-gram
  * distribution looks like a TARGET corpus (Wikipedia/books in the
  * paper; any high-quality slice in practice). The method behind the
  * "select web data that resembles the target domain" step of modern
  * LLM data recipes — the learned complement of [[QualityClassifier]]'s
  * fixed gate and the distributional complement of [[Sampling]]'s
  * explicit weights.
  *
  * Model: unigram-of-hashed-bigram-features bag model on both sides.
  * Each document's features are its bigrams hashed into B = 2^16
  * buckets ([[Splits.hashBucket]] — the engine-portable md5 bucket).
  * With Laplace-smoothed per-bucket probabilities
  * p_f = (ct_f + 1)/(Nt + B) (target) and q_f = (cr_f + 1)/(Nr + B)
  * (raw), a doc's importance weight is
  * log w(d) = Σ_{feature occurrences f ∈ d} [ln p_f − ln q_f],
  * and the selected subset is the Gumbel-top-k resample: key =
  * log w(d) + g(d) with g(d) = −ln(−ln u_d) a deterministic Gumbel
  * draw — equivalent to sampling without replacement with probability
  * ∝ w(d), the paper's resampling step.
  *
  * Determinism contract (the repo's oracle idioms): each bucket's log
  * ratio is ONE `ln` of an exact-integer-valued double ratio,
  * floor-scaled to integer 1e-6 units (q91's idiom) — so per-doc
  * scores are order-independent exact integer sums; the Gumbel draw's
  * u_d = (md5-bucket(doc_id)+1)/65537 is a pure function of the id
  * (q89's idiom); the resample key is floor-rounded to 8 dp with an id
  * tie-break. DuckDB replays every selection bit-for-bit.
  *
  * 100 TB shape: two passes over the corpus (exactly the paper's fit +
  * score structure). Pass 1 tokenizes and reduces to ≤ B per-bucket
  * (raw, target) count pairs — ONE map-side-combined aggregate whose
  * shuffle is bucket-bounded, not corpus-bounded. The λ table (≤ B
  * rows) broadcasts. Pass 2 tokenizes again, broadcast-joins λ, and
  * integer-sums per doc (map-side combined; the only corpus-keyed
  * shuffle carries (doc_id, partial sums)). Selection is
  * `orderBy(key).limit(k)` → TakeOrderedAndProject: per-partition
  * bounded heaps, no global sort. Docs with < 2 words have no
  * features and are dropped (no evidence either way — the paper
  * scores them log w = 0; dropping is this operator's stated policy).
  */
object Dsir {
  val numBuckets: Int = 1 << 16 // B — shared with Splits/QualityClassifier

  /** Per-occurrence hashed bigram feature stream:
    * (doc_id, is_target, bucket). */
  def features(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column): DataFrame = {
    val w = TextFunctions.normalizedWords(col(textCol))
    graft.sources.Balance.cpuBound(docs)
      .select(col(idCol), isTarget.as("is_target"), w.as("_w"))
      .filter(size(col("_w")) >= 2)
      .select(col(idCol), col("is_target"),
        explode(zip_with(
          slice(col("_w"), lit(1), size(col("_w")) - 1),
          slice(col("_w"), lit(2), size(col("_w")) - 1),
          (x, y) => concat(x, lit(" "), y))).as("_bg"))
      .select(col(idCol), col("is_target"), hashBucket(col("_bg")).as("bucket"))
  }

  /** Fit pass: per-bucket λ6 = floor(1e6·[ln p_f − ln q_f] + 0.5) as an
    * exact integer, for every bucket that occurs in the corpus (absent
    * buckets can never be joined by a scoring occurrence). ≤ B rows —
    * broadcastable. The ratio is composed as
    * ((ct+1)·(Nr+B)) / ((Nt+B)·(cr+1)) — each factor an exact integer
    * in double range, ONE ln call (exactness holds while counts stay
    * below 2^26-ish per factor pair; at larger corpora the additive
    * four-ln spelling bounds the error instead, trading one ulp of
    * cross-engine certainty). */
  def lambdaTable(feat: DataFrame): DataFrame = {
    val cnt = feat.groupBy("bucket").agg(
      count(lit(1)).as("cr"),
      sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"))
    val tot = cnt.agg(sum("cr").as("nr"), sum("ct").as("nt"))
    cnt.crossJoin(broadcast(tot))
      .select(col("bucket"),
        floor(log(
          ((col("ct") + 1).cast("double") * (col("nr") + numBuckets).cast("double")) /
            ((col("nt") + numBuckets).cast("double") * (col("cr") + 1).cast("double")))
          * 1e6 + 0.5).cast("long").as("lam6"))
  }

  /** Score pass: per-doc (n_feat, score_units) — the exact-integer
    * importance log-weight in 1e-6 units. */
  def importanceScores(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column): DataFrame = {
    val feat = features(docs, idCol, textCol, isTarget)
    feat.join(broadcast(lambdaTable(feat)), Seq("bucket"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_feat"), sum("lam6").as("score_units"))
  }

  /** Gumbel-top-k resample over the scored docs: the k docs with the
    * largest `score + Gumbel(doc_id)` keys (8-dp-rounded, id
    * tie-break). Output: (doc_id, n_feat, score_units, gk), best
    * first. */
  def resample(scored: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    val u = (hashBucket(col(idCol)) + 1).cast("double") / 65537.0
    val key = col("score_units").cast("double") / 1e6 + -log(-log(u))
    scored
      .withColumn("gk", floor(key * 1e8 + 0.5) / 1e8)
      .orderBy(col("gk").desc, col(idCol))
      .limit(k)
  }
}
