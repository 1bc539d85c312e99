package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Classifier calibration — the eval companion to the quality
  * classifier (q117): a score-gated pipeline is only as good as the
  * meaning of its threshold, and calibration (reliability) is what
  * says whether "p = 0.9" actually wins 90% of the time.
  *
  * Exactness contract: NO transcendentals. Probabilities come from the
  * rational "fast sigmoid" p = 1/2 + m/(2·(s+|m|)) in 1e-6 units with
  * integer division on non-negative operands (truncation == floor on
  * both engines), so p_units is an exact BIGINT everywhere. The
  * expected calibration error folds each bin's |accuracy − confidence|
  * over the common denominator N·1e6:
  *   ECE = Σ_bins |correct_b·1e6 − Σconf_b| / (N·1e6)
  * — the numerator is an exact BIGINT sum (order-independent), one
  * float division at the end under round4. The Brier score similarly
  * sums exact (p_units − y·1e6)² longs. Both hash-check bit-for-bit
  * against the DuckDB oracle.
  *
  * Bounds: Brier's squared units reach 1e12 per row, so the exact
  * BIGINT sum holds to ~9.2e6 rows per release; past that, re-scale
  * p to 1e3 units (1e6 per row → 9.2e12 rows) or accept a DOUBLE sum.
  *
  * Scale shape: pure per-row expressions → one 10-group aggregation →
  * a 1-row scalar attach. Zero joins over data, zero windows.
  */
object Calibration {

  /** Rational fast sigmoid in 1e-6 units: 500000 + sign(m)·(500000·|m|
    * div (s+|m|)). Monotone in m, p(0) = 0.5, saturates at 0/1e6;
    * s is the margin scale (the |m| at which p ≈ 0.75). All-integer:
    * the quotient is a true BIGINT `div` (Catalyst IntegralDivide — no
    * double round-trip anywhere), so exactness holds over the full
    * Long-overflow range |m| < 2^63/500000 ≈ 1.8e13, not merely the
    * 2^53 double-mantissa bound the earlier floor(double) spelling
    * silently depended on. */
  def fastSigmoidUnits(marginCol: Column, s: Long): Column = {
    // s <= 0 would make the divisor (s + |m|) zero or negative for
    // small |m| — under ANSI that's a runtime divide-by-zero, and the
    // oracle twin assumes a positive scale. Fail loudly at BUILD time
    // instead of degrading differently per engine on a degenerate scale.
    require(s >= 1, s"fastSigmoidUnits: margin scale s must be >= 1, got $s")
    val am = abs(marginCol.cast("long"))
    // exact integer quotient, matching the oracle's BIGINT // division
    // bit-for-bit: operands are non-negative so truncation == floor
    val d = GraftColumnBridge.toColumn(new IntegralDivide(
      GraftColumnBridge.toExpression(lit(500000L) * am),
      GraftColumnBridge.toExpression(lit(s) + am)))
    (lit(500000L) + signum(marginCol).cast("long") * d).cast("long")
  }

  /** DuckDB twin — `//` is floor division, exact match on the
    * non-negative operands used here. */
  def fastSigmoidUnitsSql(marginExpr: String, s: Long): String =
    s"CAST(500000 + CASE WHEN ($marginExpr) < 0 THEN -1 WHEN ($marginExpr) > 0 THEN 1 ELSE 0 END * " +
      s"((500000 * abs(CAST($marginExpr AS BIGINT))) // ($s + abs(CAST($marginExpr AS BIGINT)))) AS BIGINT)"

  /** Reliability table + ECE + Brier for a binary classifier.
    *
    * @param scored (pUnitsCol: BIGINT probability in [0, 1e6],
    *               labelCol: BOOLEAN ground truth) one row per example
    * @return one row per non-empty confidence bin (10 equal-width bins
    *         over conf ∈ [0.5, 1.0]): bin, n, avg_conf, accuracy —
    *         plus the release-level ece and brier repeated on each row
    *         (1-row scalar attach)
    */
  def binaryCalibration(scored: DataFrame, pUnitsCol: String,
      labelCol: String): DataFrame = {
    val p = col(pUnitsCol).cast("long")
    val y = col(labelCol)
    val pred = p > 500000L
    val confU = greatest(p, lit(1000000L) - p)
    val correct = (pred === y).cast("long")
    val binned = scored.select(
      least(floor((confU - 500000L).cast("double") / 50000L), lit(9.0))
        .cast("int").as("bin"),
      confU.as("conf_u"), correct.as("ok"),
      ((p - when(y, 1000000L).otherwise(0L)) * (p - when(y, 1000000L).otherwise(0L)))
        .as("sq_err"))
    val bins = binned.groupBy("bin").agg(
      count(lit(1)).as("n"),
      sum(col("conf_u")).as("sum_conf"),
      sum(col("ok")).as("sum_ok"),
      sum(col("sq_err")).as("sum_sq"))
    // |correct_b*1e6 - sum_conf_b| folds over the common denominator
    // N*1e6 -> the ECE numerator is one exact BIGINT sum
    val totals = bins.agg(
      sum(col("n")).as("n_total"),
      sum(abs(col("sum_ok") * 1000000L - col("sum_conf"))).as("ece_num"),
      sum(col("sum_sq")).as("brier_num"))
    bins.crossJoin(broadcast(totals))
      .select(col("bin"), col("n"),
        TextFunctions.round4(col("sum_conf").cast("double") /
          (col("n") * 1000000L)).as("avg_conf"),
        TextFunctions.round4(col("sum_ok").cast("double") / col("n")).as("accuracy"),
        TextFunctions.round4(col("ece_num").cast("double") /
          (col("n_total") * 1000000L)).as("ece"),
        TextFunctions.round4(col("brier_num").cast("double") /
          (col("n_total").cast("double") * 1e12)).as("brier"))
  }

  /** Split-conformal screen (Vovk et al.; the distribution-free
    * finite-sample gate): calibrate a nonconformity threshold on a
    * held-out split and flag test items above it — on exchangeable
    * data, P(flag) ≤ α on the test split, with NO distributional
    * assumption on the score. The modern way to turn any quality
    * score into a gate with a guarantee.
    *
    * Mechanics, all exact: nonconformity s = −score (lower score =
    * less conforming); calibration split = the deterministic md5
    * bucket ([[Splits.hashBucket]] < 2¹⁵, the engine-replayable coin);
    * threshold t = the k-th smallest calibration nonconformity with
    * k = min(n_cal, ⌈(n_cal+1)·(1−α)⌉) — computed by
    * [[Selection.kthSmallest]]'s counting-scan descent (exact order
    * statistic, zero shuffles, construction-time like q147/q154 —
    * never a single-partition sort). α is a rational alphaNum/alphaDen
    * so k is exact integer arithmetic. Output: one row per split
    * (calibration, test) with n, n_flagged (s > t), the flag rate
    * (round4), and the (t, k, n_cal) certificate repeated. */
  def conformalGate(scored: DataFrame, idCol: String, scoreCol: String,
      alphaNum: Long = 1L, alphaDen: Long = 10L): DataFrame = {
    require(alphaNum >= 1 && alphaNum < alphaDen,
      s"conformalGate: need 0 < alpha < 1, got $alphaNum/$alphaDen")
    val nonconf = -col(scoreCol).cast("long")
    val isCal = Splits.hashBucket(col(idCol)) < (1 << 15)
    val base = scored.select(col(idCol), nonconf.as("s"), isCal.as("is_cal"))
    // pin the narrow calibration projection ONCE: the count below and
    // the descent's ≤6 counting scans all read the checkpointed long
    // column instead of re-scanning (and re-hashing the split of) the
    // source ~8× — construction now costs one source pass, and the
    // pinned blocks are a single 8-byte column of ~half the rows
    val cal = Selection.pin(base.filter(col("is_cal")), "s")
    val nCal = cal.count()
    require(nCal > 0, "conformalGate: empty calibration split")
    // k = ceil((n_cal + 1) * (1 - alpha)); operands non-negative so
    // the truncating div is floor and the +den-1 makes it a ceil
    val k = math.min(nCal,
      ((nCal + 1) * (alphaDen - alphaNum) + alphaDen - 1) / alphaDen)
    val t = Selection.kthSmallest(cal, k)
    base
      .groupBy(when(col("is_cal"), "calibration").otherwise("test").as("split"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("s") > t, 1L).otherwise(0L)).as("n_flagged"))
      .select(col("split"), col("n"), col("n_flagged"),
        graft.functions.TextFunctions.round4(
          col("n_flagged").cast("double") / col("n").cast("double")).as("flag_rate"),
        lit(t).as("threshold"), lit(k).as("k_cal"), lit(nCal).as("n_cal"))
  }

  /** Isotonic-regression calibration (pool-adjacent-violators) over
    * score-ordered buckets — the standard PRODUCTION calibrator
    * ([[binaryCalibration]] diagnoses miscalibration; this FIXES it:
    * the monotone step function mapping score → P(y) that minimizes
    * squared error).
    *
    * PAV is a sequential pooling algorithm, which doesn't distribute —
    * so this uses its closed-form minimax characterization instead:
    *
    *   iso(i) = max_{j ≤ i} min_{k ≥ i} (Σ pos[j..k] / Σ n[j..k])
    *
    * evaluated RELATIONALLY over `bins` score buckets: interval sums
    * from a triangle join of the bin relation with itself (≤ B·(B+1)/2
    * interval rows, B ≤ 1024 `require`d), then a min-per-(i,j) /
    * max-per-i aggregation. Interval sums are exact BIGINTs; each
    * interval average is ONE double division of exact integers
    * (identical both engines); min/max over doubles is
    * order-independent — so the fit hash-checks bit-for-bit, unlike
    * any sequential-pooling float accumulation. Scores bucket by
    * exact-integer min/max scaling ((m−lo)·B div (hi−lo+1), operands
    * non-negative so div == floor-div on both engines).
    *
    * Scale shape: one pass over the data for the bin aggregation; ALL
    * interval/minimax work happens on the ≤B-row bin relation
    * (broadcast triangle joins — documented bounded NLJ shapes, the
    * q192 guard entry). Output: one row per non-empty bin:
    * (bin, n, pos, raw_rate, iso_rate), iso_rate non-decreasing in
    * bin by construction. */
  def isotonicFit(scored: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 64): DataFrame = {
    require(bins >= 1 && bins <= 1024,
      s"isotonicFit: bins must be in [1, 1024], got $bins")
    val mm = scored.agg(min(col(scoreCol).cast("long")).as("lo"),
      max(col(scoreCol).cast("long")).as("hi"))
    val binned = scored
      .select(col(scoreCol).cast("long").as("m"),
        col(labelCol).cast("long").as("y"))
      .crossJoin(broadcast(mm))
      .select(expr(s"CAST(((m - lo) * $bins) div (hi - lo + 1) AS BIGINT)").as("bin"),
        col("y"))
    val b = binned.groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("y").as("pos"))
    // triangle of (j, k) interval endpoints over PRESENT bins; empty
    // bins carry no mass, so their absence never changes an interval sum
    val jk = b.select(col("bin").as("jb"))
      .join(broadcast(b.select(col("bin").as("kb"))), col("jb") <= col("kb"))
    val ivl = jk
      .join(broadcast(b), col("bin").between(col("jb"), col("kb")))
      .groupBy("jb", "kb")
      .agg(sum("n").as("ivn"), sum("pos").as("ivp"))
    val perIJ = b.select(col("bin"))
      .join(broadcast(ivl), col("jb") <= col("bin") && col("kb") >= col("bin"))
      .groupBy("bin", "jb")
      .agg(min(col("ivp").cast("double") / col("ivn").cast("double")).as("mn"))
    val iso = perIJ.groupBy("bin").agg(max("mn").as("iso"))
    b.join(iso, Seq("bin"))
      .select(col("bin"), col("n"), col("pos"),
        TextFunctions.round4(col("pos").cast("double") / col("n").cast("double"))
          .as("raw_rate"),
        TextFunctions.round4(col("iso")).as("iso_rate"))
  }

  /** ROC-AUC of an integer score against a boolean label, via the
    * tie-corrected Mann–Whitney rank statistic — calibration (above)
    * says whether p means p; AUC says whether the score RANKS at all.
    *
    *   2U = Σ_m p_m · (2·neg_below(m) + q_m)      (m = distinct score)
    *   AUC = U / (n_pos·n_neg),  rank-Gini = 2·AUC − 1
    *
    * where p_m/q_m are the positive/negative counts at score m and
    * ties contribute exactly ½ each — all BIGINT until the one round4
    * division (exact while 2U < 2^63, i.e. n_pos·n_neg < 4.6e18).
    *
    * Scale shape: one hash aggregation by distinct score, then the
    * cumulative negative count via [[GlobalIds.prefixSum]]'s RANGE
    * exchange (never a single-partition window — the q163 KS idiom),
    * then one scalar aggregate. Output is a single row:
    * (n_pos, n_neg, u2, auc, gini_auc). */
  def rocAuc(scored: DataFrame, scoreCol: String, labelCol: String,
      parts: Int = 32): DataFrame = {
    val byScore = scored.groupBy(col(scoreCol).cast("long").as("m")).agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("p"),
      sum(when(col(labelCol), 0L).otherwise(1L)).as("q"))
    val withCq = GlobalIds.prefixSum(byScore, "q", "cq", parts, col("m"))
    val agg = withCq.agg(
      sum(col("p")).as("n_pos"), sum(col("q")).as("n_neg"),
      sum(col("p") * (lit(2L) * (col("cq") - col("q")) + col("q"))).as("u2"))
    agg.select(col("n_pos"), col("n_neg"), col("u2"),
      when(col("n_pos") > 0L && col("n_neg") > 0L, TextFunctions.round4(
        col("u2").cast("double") / (col("n_pos").cast("double") * col("n_neg") * 2.0d)))
        .as("auc"),
      when(col("n_pos") > 0L && col("n_neg") > 0L, TextFunctions.round4(
        col("u2").cast("double") / (col("n_pos").cast("double") * col("n_neg"))
          - 1.0d)).as("gini_auc"))
  }
}
