package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Splits.hashBucket

/** Model-based quality filtering via the HASHING TRICK — the
  * fastText-classifier shape modern curation pipelines (CCNet, DCLM,
  * FineWeb-Edu) use as their main quality gate: each document's bigram
  * features hash into a fixed 2^16 weight table, the document's score
  * is the sum of its features' weights, and the gate keeps documents
  * whose margin clears a threshold.
  *
  * The weight table here is a PURE FUNCTION of the feature hash
  * (weight_units = bucket − 32768 ∈ [−32768, 32767], i.e. a fixed
  * random-projection classifier), which keeps the oracle exact; a
  * TRAINED model drops in by replacing that expression with a lookup
  * into a broadcast (bucket → weight) table — the broadcast-model join
  * shape [[Decontamination]] and [[graft.functions.VocabTokenizer]]
  * already demonstrate. Integer weights summed exactly mean the margin
  * is order-independent and engine-portable — no float drift at the
  * keep/drop boundary.
  *
  * Scale shape: ZERO shuffle at scale. Tokenize, bigram, hash and sum
  * all happen inside one narrow projection per document (higher-order
  * `aggregate` over the bigram array — no explode, no per-feature
  * rows, no agg exchange); 100 TB of text scores at scan speed and the
  * only data movement is whatever the caller does with the verdict
  * column. (`Balance.cpuBound` adds its small-input round-robin
  * rebalance ONLY when the scan has fewer splits than cores — inert on
  * any real corpus.)
  */
object QualityClassifier {

  /** Per-doc (n_feat, margin_units, keep): bigram count, exact integer
    * margin in 1/32768 units, and the margin > 0 gate. */
  def hashedBigramScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = coalesce(TextFunctions.normalizedWords(col(textCol)), array())
    val bigrams = when(size(col("_w")) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(col("_w")) - 1),
        i => concat(element_at(col("_w"), i), lit(" "), element_at(col("_w"), i + 1))))
    graft.sources.Balance.cpuBound(docs)
      .select(col(idCol), w.as("_w"))
      .select(col(idCol), bigrams.as("_bg"))
      .select(col(idCol),
        size(col("_bg")).cast("long").as("n_feat"),
        aggregate(col("_bg"), lit(0L),
          (acc, bg) => acc + (hashBucket(bg) - 32768).cast("long")).as("margin_units"))
      .withColumn("keep", col("margin_units") > 0)
  }
}
