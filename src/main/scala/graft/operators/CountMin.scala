package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Count–Min sketch (Cormode & Muthukrishnan, J. Algorithms '05) — the
  * point-frequency companion to the corpus's other bounded summaries
  * (HLL distincts, Misra–Gries heavy hitters, GK quantiles): d×w long
  * counters answer "how often did token x occur?" for EVERY x with
  * one-sided error — `est(x) ≥ true(x)` always, and
  * `est(x) ≤ true(x) + (e/w)·N` with probability ≥ 1 − e^−d per
  * query — without ever materializing the (at 100 TB, billions-row)
  * exact vocabulary aggregate.
  *
  * Scale shape: the sketch is a single `Aggregator` producing ONE
  * bounded row (d·w longs, 80 KB at the default 5×2048) — partials
  * merge map-side, only sketches cross the shuffle, estimates are
  * driver-side array reads. Mergeability is exact (elementwise sum),
  * so the same aggregator serves batch, incremental (sketch per
  * snapshot, add later), and streaming state.
  */
object CountMin {

  /** Sketch state: exact stream length + row-major d×w counter grid. */
  case class CMState(total: Long, d: Int, w: Int, counts: Array[Long])

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Row hash: position of `word` in sketch row `i` — the first 16
    * bits of md5("i|word") mod w (the repo's engine-portable bucket
    * idiom: any SQL engine with md5 replays the slot, which is what
    * lets q86 carry a full DuckDB oracle instead of a self-gate). For
    * the default w=2048 the mod is exact (2048 | 2^16), so the slot
    * distribution is unbiased. md5 costs ~4× murmur per token — paid
    * d times per ingested token; a throughput-critical deployment can
    * swap a faster hash back in at the cost of oracle replay. */
  private[graft] def slot(word: String, i: Int, w: Int): Int = {
    val md = md5Local.get()
    md.reset()
    val h = md.digest((i.toString + "|" + word)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % w
  }

  class CountMinAgg(d: Int, w: Int) extends Aggregator[String, CMState, CMState] {
    require(d >= 1 && w >= 2, s"need d>=1, w>=2; got d=$d w=$w")

    def zero: CMState = CMState(0L, d, w, new Array[Long](d * w))

    def reduce(s: CMState, word: String): CMState = {
      // in-place on the buffer array: the typed-agg buffer is partition-
      // local between serialization points, same pattern as built-in
      // typed aggregators
      var i = 0
      while (i < d) { s.counts(i * w + slot(word, i, w)) += 1L; i += 1 }
      CMState(s.total + 1L, d, w, s.counts)
    }

    def merge(a: CMState, b: CMState): CMState = {
      val out = new Array[Long](d * w)
      var i = 0
      while (i < d * w) { out(i) = a.counts(i) + b.counts(i); i += 1 }
      CMState(a.total + b.total, d, w, out)
    }

    def finish(s: CMState): CMState = s
    def bufferEncoder: Encoder[CMState] = Encoders.product[CMState]
    def outputEncoder: Encoder[CMState] = Encoders.product[CMState]
  }

  /** Point estimate: min over rows (the CM rule). One-sided:
    * never below the true count. */
  def estimate(s: CMState, word: String): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < s.d) {
      val c = s.counts(i * s.w + slot(word, i, s.w))
      if (c < best) best = c
      i += 1
    }
    best
  }

  /** Sketch the normalized token stream of `docs(textCol)`. */
  def sketchTokens(docs: DataFrame, textCol: String, d: Int, w: Int): CMState = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.sources.Balance.cpuBound(docs)
      .select(explode(TextFunctions.normalizedWords(col(textCol))).as("word"))
      .as[String]
      .select(new CountMinAgg(d, w).toColumn)
      .head()
  }
}
