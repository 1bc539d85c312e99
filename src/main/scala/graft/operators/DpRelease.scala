package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SIMULATED differentially-private aggregate release — the governance
  * step after k-anonymity (q120) and pseudonymization (q94): publish
  * per-group counts with calibrated noise so no single row's presence
  * is identifiable, while keeping the release ENGINE-REPLAYABLE (the
  * repo's sampling contract: every random draw is a pure md5 function
  * of its coordinates, q50/q89/q172's idiom — no RNG state, identical
  * bits on any engine).
  *
  * ==NOT a production DP mechanism as committed==
  * The replayability that makes the mechanism oracle-checkable is
  * exactly what voids the privacy guarantee if misused: the noise is a
  * pure function of (seed, group key), so ANYONE WHO KNOWS THE SEED
  * CAN SUBTRACT THE NOISE and recover the exact counts. The declared
  * queries q178/q179 commit their seeds as string literals — that is
  * deliberate (the DuckDB oracle must replay the draw), and it means
  * those outputs are demonstrations of the mechanism, not releases.
  * For a REAL release the seed plays the role of the mechanism's
  * secret randomness and MUST be (a) high-entropy, (b) kept as secret
  * as the raw data, and (c) single-use per (release, ε-budget) — reuse
  * across releases correlates the noise and composes ε silently.
  * Additionally, emitting only OBSERVED groups leaks membership
  * through presence/absence regardless of noise (a unique group key
  * appears iff its one row exists): a real release must enumerate a
  * KNOWN, data-independent key domain — pass `domain` to
  * [[simulatedNoisyCounts]] so absent groups are published as noised
  * zeros. The `simulated` naming is the guard rail: there is no
  * non-simulated spelling in this repo to mistake it for.
  *
  * Mechanism: truncated discrete Laplace (two-sided geometric) with
  * alpha = 1/2, i.e. P(noise = k) ∝ 2^(−|k|) for k ∈ [−B, B] — the
  * geometric mechanism of Ghosh–Roughgarden–Sundararajan (SIAM J.
  * Comput. 2012), the universally-optimal mechanism for count queries.
  * alpha = 1/2 gives per-count ε = ln 2; truncation at B leaves tail
  * mass < 2·2^(−B) (δ ≈ 2^(−B+1), negligible at the default B = 20).
  * Everything is EXACT 64-bit integer arithmetic: weights are powers
  * of two (w_k = 2^(B−|k|), total T = 3·2^B − 2 < 2^48), the uniform
  * draw is a 48-bit md5 prefix mod T (modulo bias ≤ T/2^48), and the
  * inverse-CDF walk is a literal threshold chain generated ONCE and
  * shared verbatim by the Spark plan and the DuckDB oracle — no
  * floating point anywhere, so the release hash-checks bit-for-bit.
  *
  * Shape at scale: one hash aggregation (map-side combinable count),
  * then pure per-row expressions — the noise attach adds ZERO
  * exchanges, no joins, no windows. Groups ≪ rows, so the noisy
  * release costs exactly what the exact counts cost.
  */
object DpRelease {

  /** Inverse-CDF thresholds for the truncated discrete Laplace with
    * alpha = 1/2: returns (hiExclusive, k) pairs ordered k = −B..B,
    * where a uniform u ∈ [0, T) maps to the first k with u < hi.
    * Weights w_k = 2^(B−|k|); T = 3·2^B − 2. */
  def noiseThresholds(b: Int): Seq[(Long, Int)] = {
    require(b >= 1 && b <= 40, s"truncation B=$b out of (1, 40]")
    val ks = (-b to b)
    val weights = ks.map(k => 1L << (b - math.abs(k)))
    val his = weights.scanLeft(0L)(_ + _).tail
    his.zip(ks).map { case (hi, k) => (hi, k) }
  }

  /** Total weight T = 3·2^B − 2 (the draw modulus). */
  def totalWeight(b: Int): Long = 3L * (1L << b) - 2L

  /** The deterministic uniform draw for one group: 48-bit md5 prefix
    * of `seed|key` mod T — same construction as the SQL twin
    * [[drawSql]]. */
  def draw(keyCol: Column, seed: String, b: Int): Column =
    pmod(conv(substring(md5(concat(lit(seed + "|"), keyCol)), 1, 12), 16, 10)
      .cast("long"), lit(totalWeight(b)))

  /** DuckDB twin of [[draw]]: 48-bit md5 prefix (12 hex digits; every
    * digit product ≤ 15·16¹¹ < 2^48 stays exact in DOUBLE, lossless
    * BIGINT cast) mod T. `keyExpr` must be a VARCHAR expression. */
  def drawSql(keyExpr: String, seed: String, b: Int): String =
    "CAST(list_sum(list_transform(range(1, 13), i -> " +
      s"CAST((strpos('0123456789abcdef', substr(md5('$seed|' || ($keyExpr)), i, 1)) - 1) " +
      s"AS DOUBLE) * pow(16, 12 - i))) AS BIGINT) % ${totalWeight(b)}"

  /** Noise as a CASE chain over [[noiseThresholds]] — Spark side. */
  def noise(uCol: Column, b: Int): Column = {
    val ts = noiseThresholds(b)
    ts.init.foldRight(lit(ts.last._2): Column) { case ((hi, k), rest) =>
      when(uCol < hi, k).otherwise(rest)
    }.cast("long")
  }

  /** Noise as a CASE chain — the IDENTICAL literals for the oracle. */
  def noiseSql(uExpr: String, b: Int): String = {
    val ts = noiseThresholds(b)
    val whens = ts.init.map { case (hi, k) => s"WHEN ($uExpr) < $hi THEN $k" }
    s"CAST(CASE ${whens.mkString(" ")} ELSE ${ts.last._2} END AS BIGINT)"
  }

  /** Simulated DP noisy group counts: exact count per group, plus the
    * deterministic geometric noise, clamped at 0 (post-processing
    * preserves DP). Output: groupCols*, `exact_count`, `noise` and
    * `noisy_count` (for specs/audit — a REAL release would drop
    * `noise` and the exact count; the declared query q178 keeps both
    * so the mechanism itself is oracle-checkable). Group keys are
    * joined with the \u001f separator (nulls to '' — callers with
    * null-able keys should pre-coalesce distinctly, the SnapshotDiff
    * caveat). See the object doc: with a committed seed this is a
    * DEMONSTRATION of the mechanism, not a private release.
    *
    * @param domain optional COMPLETE, data-independent key relation
    *        (rows over exactly `groupCols`): when given, every domain
    *        key is emitted — absent groups as noised zeros — so a
    *        key's presence/absence no longer leaks membership.
    *        Observed groups ABSENT from the domain are intentionally
    *        suppressed — emitting a key the public domain doesn't
    *        contain would itself leak membership, so the domain is
    *        authoritative by design. The flip side: an accidentally
    *        incomplete domain silently loses real counts; callers
    *        should gate with [[outOfDomainKeys]].isEmpty in a spec
    *        (kept out of the release path so the hot path stays one
    *        job, no extra action). Required for anything resembling a
    *        real release; None reproduces the observed-groups
    *        demonstration shape q178 oracle-checks. */
  /** Audit companion for the `domain` parameter of
    * [[simulatedNoisyCounts]]: the OBSERVED group keys that the given
    * domain does NOT contain (i.e. the keys a domain-grounded release
    * would suppress). Empty ⇔ the domain is complete for this data.
    * Deliberately a separate relation rather than an assert inside the
    * release — checking emptiness forces a Spark action, which belongs
    * in the caller's validation step, not in the release plan. */
  def outOfDomainKeys(df: DataFrame, groupCols: Seq[String],
      domain: DataFrame): DataFrame =
    df.select(groupCols.map(col): _*).distinct()
      .join(domain.select(groupCols.map(col): _*).distinct(),
        groupCols, "left_anti")

  def simulatedNoisyCounts(df: DataFrame, groupCols: Seq[String],
      seed: String, b: Int = 20,
      domain: Option[DataFrame] = None): DataFrame = {
    require(groupCols.nonEmpty)
    val counts = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("exact_count"))
    val grounded = domain match {
      case Some(d) =>
        // the (small, public) domain drives: absent groups surface
        // with exact_count = 0 and still draw their own noise
        d.select(groupCols.map(col): _*).distinct()
          .join(counts, groupCols, "left")
          .select(groupCols.map(col) :+
            coalesce(col("exact_count"), lit(0L)).as("exact_count"): _*)
      case None => counts
    }
    val key = concat_ws("\u001f",
      groupCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
    grounded
      // alias the draw once so the 2B+1-branch CASE references a single
      // computed column, not 2B+1 copies of the md5 expression
      .withColumn("__graft_u", draw(key, seed, b))
      .select(groupCols.map(col) ++ Seq(
        col("exact_count"),
        noise(col("__graft_u"), b).as("noise")): _*)
      .withColumn("noisy_count",
        greatest(col("exact_count") + col("noise"), lit(0L)))
  }

  /** Simulated DP noisy group SUMS with per-row contribution clipping
    * (same seed-secrecy and observed-groups caveats as
    * [[simulatedNoisyCounts]] — see the object doc): each
    * row's integer value is clipped to [0, clip] (bounding the
    * sensitivity at `clip`), summed exactly per group, then noised
    * with `clip · k` where k is the same truncated discrete Laplace
    * draw — the scaled geometric mechanism keeps ε = ln 2 for the
    * clipped sum (neighboring sums differ by ≤ clip; the distribution
    * ratio under a clip-sized shift is ≤ 2). Still pure integer
    * arithmetic end-to-end. A release combining [[simulatedNoisyCounts]]
    * and simulatedNoisySums over the same groups must use DIFFERENT
    * seeds (draws are otherwise identical) and composes ε additively. */
  def simulatedNoisySums(df: DataFrame, groupCols: Seq[String], valueCol: String,
      clip: Long, seed: String, b: Int = 20): DataFrame = {
    require(groupCols.nonEmpty && clip >= 1)
    val key = concat_ws("\u001f",
      groupCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
    val v = least(greatest(col(valueCol).cast("long"), lit(0L)), lit(clip))
    df.groupBy(groupCols.map(col): _*)
      .agg(sum(v).as("clipped_sum"))
      .withColumn("__graft_u", draw(key, seed, b))
      .select(groupCols.map(col) ++ Seq(
        col("clipped_sum"),
        (noise(col("__graft_u"), b) * clip).as("noise")): _*)
      .withColumn("noisy_sum",
        greatest(col("clipped_sum") + col("noise"), lit(0L)))
  }
}
