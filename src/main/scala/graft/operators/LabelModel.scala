package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Weak-supervision label modeling (the Snorkel idea, reduced to its
  * deterministic core): K independent labeling functions vote on every
  * document, the panel's majority becomes the training label, and
  * Fleiss' kappa says whether the functions actually AGREE beyond
  * chance — a panel with kappa near 0 is noise voting, and the
  * "labels" it emits are not supervision.
  *
  * Exactness contract: every labeling function is an exact-integer
  * rule (counts and cross-multiplied ratio bounds — `3n <= chars` in
  * place of `chars/n >= 3.0`), so votes are exact BIGINTs on both
  * engines. Fleiss' components stay integer to the end:
  *   A  = Σ_i [v_i(v_i−1) + (K−v_i)(K−1−v_i)]   (observed pair-agreements)
  *   T1 = Σ_i v_i                               (total positive votes)
  * with P_o = A/(N·K·(K−1)), p_1 = T1/(N·K), P_e = p_1² + (1−p_1)².
  * The final kappa = (P_o−P_e)/(1−P_e) is one fixed double expression
  * over (A, T1, N) — identical IEEE operations in identical order on
  * both engines, then round4.
  *
  * Scale shape: narrow per-row rule evaluation → one K+1-group
  * aggregation → a 1-row scalar attach. Zero joins over data, zero
  * windows — the same shape as [[Calibration]].
  */
object LabelModel {

  /** The 8-word stopword panel shared with q177/q181. */
  val stops: Seq[String] = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document votes of the 5 deterministic labeling functions
    * (Gopher-style quality rules, each exact-integer):
    *   lf_wordcount   50 <= n <= 100000
    *   lf_meanlen     3n <= Σ|w| <= 10n      (mean word length in [3,10])
    *   lf_stopwords   >= 2 distinct panel stopwords
    *   lf_distinct    2·|distinct| >= n      (distinct-word ratio >= 0.5)
    *   lf_maxfreq     10·max_count <= n      (no word above 10% of tokens)
    * Null-text rows are dropped (no evidence — a rater who never saw
    * the item does not vote). Output: (idCol, lf_1..lf_5 BOOLEAN,
    * votes BIGINT). */
  def lfVotes(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = TextFunctions.normalizedWords(col(textCol))
    val out = graft.sources.Balance.cpuBound(docs)
      .filter(col(textCol).isNotNull)
      .select(col(idCol), w.as("_w"))
      .select(col(idCol), col("_w"),
        // one native hash pass for (distinct, max multiplicity) — the
        // composed distinct+filter-count form was O(d·n) interpreted
        // per row (see TextNormExprs.WordMultiplicityExpr)
        graft.plans.TextNormExprs.wordMultiplicity(col("_w")).as("_dm"))
      .select(col(idCol),
        size(col("_w")).cast("long").as("_n"),
        aggregate(col("_w"), lit(0L), (acc, x) => acc + length(x)).as("_chars"),
        size(array_intersect(col("_w"),
          array(stops.map(lit): _*))).cast("long").as("_sd"),
        col("_dm.d").as("_d"),
        col("_dm.mx").as("_mx"))
    val lfs = Seq(
      ("lf_wordcount", col("_n") >= 50L && col("_n") <= 100000L),
      ("lf_meanlen", lit(3L) * col("_n") <= col("_chars") &&
        col("_chars") <= lit(10L) * col("_n")),
      ("lf_stopwords", col("_sd") >= 2L),
      ("lf_distinct", lit(2L) * col("_d") >= col("_n")),
      ("lf_maxfreq", lit(10L) * col("_mx") <= col("_n")))
    out.select(
      (col(idCol) +: lfs.map { case (n, c) => c.as(n) }) :+
        lfs.map { case (_, c) => c.cast("long") }.reduce(_ + _).as("votes"): _*)
  }

  /** Vote histogram + Fleiss' kappa for a K-rater binary panel.
    *
    * @param votes one row per item with `votesCol` = positive votes in
    *              [0, k]
    * @return one row per observed vote count: votes, n_docs,
    *         majority_keep (votes > k/2), plus the release-level p_o,
    *         p_e, kappa repeated on each row (1-row scalar attach)
    */
  def fleissAgreement(votes: DataFrame, votesCol: String, k: Int): DataFrame = {
    require(k >= 2, s"need k >= 2 raters, got $k")
    val v = col(votesCol).cast("long")
    val hist = votes.groupBy(v.as("votes")).agg(
      count(lit(1)).as("n_docs"),
      sum(v * (v - 1L) + (lit(k.toLong) - v) * (lit(k.toLong - 1) - v)).as("_a"),
      sum(v).as("_t1"))
    val tot = hist.agg(
      sum(col("n_docs")).as("_n"), sum(col("_a")).as("_asum"), sum(col("_t1")).as("_t"))
    // fixed double formula over the exact integers — identical op
    // order on both engines, so kappa hash-checks bit-for-bit
    val po = col("_asum").cast("double") /
      (col("_n").cast("double") * (k * (k - 1)).toDouble)
    val p1 = col("_t").cast("double") / (col("_n").cast("double") * k.toDouble)
    val pe = p1 * p1 + (lit(1.0d) - p1) * (lit(1.0d) - p1)
    hist.crossJoin(broadcast(tot))
      .select(col("votes"), col("n_docs"),
        (col("votes") * 2L > k.toLong).as("majority_keep"),
        TextFunctions.round4(po).as("p_o"),
        TextFunctions.round4(pe).as("p_e"),
        TextFunctions.round4((po - pe) / (lit(1.0d) - pe)).as("kappa"))
  }
}
