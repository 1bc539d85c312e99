package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi & Sunter, JASA 1969) with
  * blocking — the entity-resolution primitive of a data-integration
  * pipeline: link two record sets that share no reliable key by
  * scoring candidate pairs on per-field agreement.
  *
  * Model: each field carries an agreement weight ≈ log₂(m/u) and a
  * disagreement weight ≈ log₂((1−m)/(1−u)) (m = P(agree | match),
  * u = P(agree | non-match)); a pair's score is the sum over fields,
  * classified against the (lower, upper) thresholds into
  * match / clerical review / non-match. Weights here are caller-chosen
  * fixed-point integers (BIGINT, typically 1e3-scaled log-odds) so the
  * whole score is exact integer arithmetic — bit-identical in any
  * engine, no float summation order to defend.
  *
  * Scale shape: candidate generation is ONE hash equi-join on the
  * blocking key — never an all-pairs. Blocking bounds the candidate
  * volume at Σ_b |L_b|·|R_b|; pick keys whose block sizes are bounded
  * (nation, zip prefix, phonetic code) exactly as the dedup family's
  * band caps do ([[Dedup]]). Scoring is a narrow projection on the
  * joined pairs.
  */
object RecordLinkage {

  /** One comparison field: agreement is null-safe equality of
    * `l_<field>` vs `r_<field>` (callers pre-derive comparable
    * columns — cents, normalized names, phonetic codes — in the
    * projections they pass in). */
  case class LinkRule(field: String, agreeWeight: Long, disagreeWeight: Long)

  /** Block-join `left` × `right` on equal `blockCols`, score each
    * candidate pair by the summed agree/disagree weights, and classify:
    * score ≥ `upper` → 'match', score ≤ `lower` → 'nonmatch', else
    * 'review'. Output: l_/r_-prefixed id + compared fields, per-pair
    * `score` BIGINT and `decision`. */
  def link(left: DataFrame, right: DataFrame, idCol: String,
      blockCols: Seq[String], rules: Seq[LinkRule],
      lower: Long, upper: Long): DataFrame =
    linkMultiPass(left, right, idCol, Seq(blockCols), rules, lower, upper)

  /** MULTI-PASS blocking — the production spelling: one coarse key
    * (nation) bounds nothing when the data piles into few blocks
    * (measured: nation-only blocking went quadratic at 150 k customers
    * — 6 000-per-block → 900 M candidate pairs, 15 s where 0.6 s
    * should be). Real linkers run SEVERAL FINE passes (zip+year,
    * phonetic-name, exact-amount …), each an equi-join with O(1)
    * blocks, and union the candidate sets: a true pair only needs to
    * survive ONE pass, so recall composes across passes while each
    * pass's volume stays linear. Candidates dedup on the id pair
    * before scoring. */
  def linkMultiPass(left: DataFrame, right: DataFrame, idCol: String,
      passes: Seq[Seq[String]], rules: Seq[LinkRule],
      lower: Long, upper: Long): DataFrame = {
    require(rules.nonEmpty, "record_linkage: no comparison rules")
    require(passes.nonEmpty && passes.forall(_.nonEmpty),
      "record_linkage: blocking keys required — an unblocked link is an all-pairs join")
    require(lower <= upper, s"record_linkage: lower $lower > upper $upper")
    val fields = (idCol +: (passes.flatten ++ rules.map(_.field))).distinct
    val l = left.select(fields.map(c => col(c).as(s"l_$c")): _*)
    val r = right.select(fields.map(c => col(c).as(s"r_$c")): _*)
    val cands = passes.map { bc =>
      l.join(r, bc.map(c => col(s"l_$c") === col(s"r_$c")).reduce(_ && _))
    }.reduce(_ unionByName _)
      .dropDuplicates(s"l_$idCol", s"r_$idCol")
    val score = rules.map { ru =>
      when(col(s"l_${ru.field}") <=> col(s"r_${ru.field}"),
        lit(ru.agreeWeight)).otherwise(lit(ru.disagreeWeight))
    }.reduce(_ + _)
    cands
      .withColumn("score", score)
      .withColumn("decision",
        when(col("score") >= upper, "match")
          .when(col("score") <= lower, "nonmatch")
          .otherwise("review"))
  }
}
