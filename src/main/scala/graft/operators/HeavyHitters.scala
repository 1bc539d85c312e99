package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Frequent-token ("heavy hitter") detection in the production two-pass
  * shape: a bounded mergeable sketch pass finds the candidate set plus
  * the exact stream length, then an exact counting pass restricted to
  * those candidates produces the final answer. The sketch is a
  * Misra–Gries summary — `total/(k+1)` is the maximum undercount, so
  * for any support threshold φ > 1/(k+1) the candidate set provably
  * contains every token with true frequency ≥ φ·total (no false
  * negatives), and the refine pass makes the output exact: identical
  * to the full groupBy-count answer while only ever shuffling the
  * candidate subset.
  *
  * Scale shape: pass 1 is a single aggregation to ONE bounded row
  * (k counters), partial-merged map-side — nothing but sketches cross
  * the shuffle; pass 2 is a semi-join-style filter (an `isin` over ≤k
  * strings, compiled to an InSet) followed by one hash aggregation of
  * only the frequent tokens. No full vocabulary aggregation ever runs —
  * at 100 TB the full groupBy("word") this replaces is itself the
  * bottleneck (billions of distinct long-tail tokens).
  */
object HeavyHitters {

  /** Sketch state: exact stream length + at most k counters. */
  case class MGState(total: Long, counters: Map[String, Long])

  /** Mergeable Misra–Gries summary (Misra & Gries '82; mergeability per
    * Agarwal et al., "Mergeable Summaries", PODS'12). Invariant after
    * any sequence of reduce/merge: for every token x,
    * `true_count(x) - total/(k+1) <= counter(x) <= true_count(x)`
    * (absent counter = 0) — so every token with true count strictly
    * above `total/(k+1)` holds a counter. reduce is amortized O(1)
    * (each O(k) decrement event is paid for by k preceding increments);
    * merge is O(k log k) for the (k+1)-th-largest selection. */
  class MisraGries(k: Int) extends Aggregator[String, MGState, MGState] {
    require(k > 0, s"need k > 0, got $k")

    def zero: MGState = MGState(0L, Map.empty)

    def reduce(s: MGState, w: String): MGState = {
      val c = s.counters
      val next =
        if (c.contains(w)) c.updated(w, c(w) + 1L)
        else if (c.size < k) c.updated(w, 1L)
        // classic MG step: a new token with all k counters taken
        // decrements every counter (the new token is "absorbed" along
        // with one unit of each tracked token); zeros are evicted
        else c.collect { case (t, n) if n > 1L => t -> (n - 1L) }
      MGState(s.total + 1L, next)
    }

    def merge(a: MGState, b: MGState): MGState = {
      val sum = (a.counters.keySet ++ b.counters.keySet).iterator.map { t =>
        t -> (a.counters.getOrElse(t, 0L) + b.counters.getOrElse(t, 0L))
      }.toMap
      val pruned =
        if (sum.size <= k) sum
        else {
          // subtract the (k+1)-th largest count from all and keep the
          // strictly positive remainder: ≤ k survivors, and the
          // per-token undercount bounds of the two inputs ADD — the
          // mergeable-summaries argument
          val d = sum.valuesIterator.toArray.sortInPlace()(Ordering[Long].reverse).apply(k)
          sum.collect { case (t, n) if n > d => t -> (n - d) }
        }
      MGState(a.total + b.total, pruned)
    }

    def finish(s: MGState): MGState = s
    def bufferEncoder: Encoder[MGState] = Encoders.product[MGState]
    def outputEncoder: Encoder[MGState] = Encoders.product[MGState]
  }

  /** Exact frequent tokens over the corpus: every normalized token with
    * count ≥ ceil(minFreq · total), found sketch-first. Output
    * (word, cnt, freq) is provably identical to the full
    * groupBy-count formulation (the oracle) whenever
    * `minFreq > 1/(k+1)` — enforced here. */
  def frequentTokens(docs: DataFrame, textCol: String, k: Int,
      minFreq: Double): DataFrame = {
    require(minFreq > 1.0 / (k + 1),
      s"minFreq=$minFreq is below the sketch guarantee 1/(k+1)=${1.0 / (k + 1)} — " +
        "raise k or the threshold, or the candidate set may miss frequent tokens")
    val spark = docs.sparkSession
    import spark.implicits._
    // tokenize + per-row sketch reduce is the heaviest CPU-bound narrow
    // map in this file: rebalance off a 1-2-split small scan (no-op at
    // scale), for both the sketch pass and the exact refine pass
    val tokens = graft.sources.Balance.cpuBound(docs).select(
      explode(TextFunctions.normalizedWords(col(textCol))).as("word"))
    // pass 1: ONE bounded row (≤ k counters + exact total) to the driver
    val sk = tokens.as[String].select(new MisraGries(k).toColumn).head()
    val threshold = math.ceil(sk.total * minFreq).toLong
    val candidates = sk.counters.keys.toSeq
    // pass 2: exact counts restricted to the ≤ k candidates (InSet
    // filter pushes to the scan side of the agg); guarantee above makes
    // the HAVING-filtered result exact
    tokens.filter(col("word").isin(candidates: _*))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .withColumn("freq",
        TextFunctions.round4(col("cnt").cast("double") / sk.total))
  }
}
