package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance-1 similarity self-join via deletion-neighborhood
  * blocking (the FastSS / Mor–Fraenkel scheme) — the record-linkage /
  * typo-clustering primitive of entity resolution and near-duplicate
  * key cleanup.
  *
  * The exactness hinge: for strings s, t,
  * `levenshtein(s, t) <= 1  ⇔  D(s) ∩ D(t) ≠ ∅` where
  * `D(s) = {s} ∪ { s with one character deleted }`.
  *  - substitution at position i: both sides delete i → same variant;
  *  - insertion/deletion: the longer side deletes the extra char → the
  *    shorter string itself;
  *  - equality: both contain s.
  * The refine step (exact `levenshtein` on candidates only) removes the
  * false positives the blocking admits (e.g. "ab"/"ba" share variants
  * "a" and "b" but are distance 2).
  *
  * 100 TB shape: each string explodes to len+1 variant keys, pairs come
  * from a hash-partitionable EQUI-join on the variant, and the exact
  * filter runs on candidates only — never an all-pairs comparison
  * (contrast the naive theta join, a cartesian). Variant keys are
  * hashed to 64-bit before the join so the shuffle carries 8-byte keys,
  * not near-duplicate copies of every document (the [[Dedup]] span-hash
  * idiom). A bucket-frequency cap (`maxVariantDf`, the `maxSpanDf`
  * pattern) guards the boilerplate blowup: a variant shared by m
  * strings yields C(m,2) candidates, so over-cap buckets — constant
  * prefixes of serial identifiers, empty-ish strings — are stripped
  * rather than detonated.
  */
object FuzzyJoin {

  /** All deletion variants of `s`, plus `s` itself. */
  def deletionVariants(s: Column): Column =
    array_union(
      array(s),
      transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s)))))

  /** Distinct candidate id pairs (id_a < id_b) within edit distance 1
    * on `strCol`, exact after refine. `maxVariantDf` strips variant
    * buckets shared by more than that many strings. */
  def edit1Pairs(df: DataFrame, idCol: String, strCol: String,
      maxVariantDf: Option[Int] = None): DataFrame = {
    val keyed = df
      .select(col(idCol).as("_fj_id"), col(strCol).as("_fj_s"))
      .withColumn("_fj_v", explode(deletionVariants(col("_fj_s"))))
      // 8-byte join key; the (id, string) payload rides alongside so the
      // refine never re-reads the input relation
      .select(col("_fj_id"), col("_fj_s"), xxhash64(col("_fj_v")).as("_fj_k"))
      .distinct() // a string can produce the same variant twice (equal adjacent chars)
    val capped = maxVariantDf match {
      case None => keyed
      case Some(cap) =>
        val hot = keyed.groupBy("_fj_k").count()
          .filter(col("count") > cap).select("_fj_k")
        keyed.join(hot, Seq("_fj_k"), "left_anti")
    }
    val a = capped.select(col("_fj_k"),
      col("_fj_id").as("id_a"), col("_fj_s").as("name_a"))
    val b = capped.select(col("_fj_k"),
      col("_fj_id").as("id_b"), col("_fj_s").as("name_b"))
    a.join(b, Seq("_fj_k"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "name_a", "name_b")
      .distinct()
      .filter(levenshtein(col("name_a"), col("name_b")) <= 1)
  }
}
