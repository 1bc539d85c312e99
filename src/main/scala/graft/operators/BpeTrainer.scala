package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding vocabulary TRAINING (Sennrich et al.,
  * ACL 2016) — learning the subword vocabulary from the corpus with the
  * engine itself, so the pieces [[graft.functions.VocabTokenizer]]
  * loads are reproducible in-repo rather than imported.
  *
  * The scale structure mirrors every production BPE trainer: the corpus
  * is touched EXACTLY ONCE (the word-count aggregation — corpus-sized,
  * one shuffle on the word). Every merge round after that runs over the
  * word-count table, which is VOCABULARY-bounded (Heaps' law: ~unique
  * words, not tokens), stays distributed, and sends one scalar row per
  * round to the driver:
  *
  *   round r: adjacent piece pairs, count-weighted → hash agg →
  *            argmax via TakeOrdered(1) (count DESC, pair ASC — a total
  *            deterministic tiebreak) → broadcast the winning pair →
  *            one narrow map rewrites segmentations.
  *
  * The merge application (greedy leftmost-first rewrite of overlapping
  * occurrences, e.g. "aaa" + (a,a) → [aa, a]) is a per-row sequential
  * scan with carried state — expressed as a Scala UDF deliberately: it
  * runs on the vocab-bounded word table, never the corpus, so codegen
  * pressure is irrelevant, and the leftmost-first semantics are the
  * part a higher-order array function cannot express.
  *
  * Lineage is truncated every few rounds (the [[Dedup]] CC-loop idiom)
  * so 100+ rounds don't accumulate a 100-deep plan.
  *
  * Invariant the self-gate leans on: the winning pair count is
  * NON-INCREASING across rounds — a merge (a,b)→ab only ever lowers
  * existing pair counts, and every newly-created pair (x,ab)/(ab,y)
  * occurs at a subset of the positions of (x,a)/(b,y), which were
  * candidates the round before.
  */
object BpeTrainer {

  /** One learned merge: at `step`, `left`+`right` (count `cnt`) fused
    * into piece `piece`. */
  final case class Merge(step: Int, left: String, right: String, cnt: Long) {
    def piece: String = left + right
  }

  private val applyMergeUdf = udf { (pieces: Seq[String], l: String, r: String) =>
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < pieces.length) {
      if (i + 1 < pieces.length && pieces(i) == l && pieces(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += pieces(i); i += 1 }
    }
    out.toSeq
  }

  /** Learn up to `merges` merges from a `(word, cnt)` relation (words
    * already normalized); stops early when the best pair count falls
    * below `minCount`. */
  def train(wordCounts: DataFrame, merges: Int, minCount: Long = 2L): Seq[Merge] = {
    var seg = wordCounts
      .select(col("word"), col("cnt").cast("long").as("cnt"))
      .filter(length(col("word")) > 0)
      .withColumn("pieces", split(col("word"), ""))
      .drop("word")
      .localCheckpoint()
    val learned = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var step = 0
    var done = false
    while (step < merges && !done) {
      val best = seg
        // adjacent pairs: zip the array with its own tail (empty for
        // single-piece words — explode then drops the row)
        .select(col("cnt"), explode(zip_with(
          slice(col("pieces"), lit(1), size(col("pieces")) - 1),
          slice(col("pieces"), lit(2), size(col("pieces")) - 1),
          (l, r) => struct(l.as("l"), r.as("r")))).as("p"))
        .groupBy(col("p.l"), col("p.r")).agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect() // TakeOrdered: ONE scalar row per round
      best.headOption.map(r => (r.getString(0), r.getString(1), r.getLong(2))) match {
        case Some((l, r, c)) if c >= minCount =>
          step += 1
          learned += Merge(step, l, r, c)
          seg = seg.withColumn("pieces", applyMergeUdf(col("pieces"), lit(l), lit(r)))
          if (step % 8 == 0) seg = seg.localCheckpoint()
        case _ => done = true
      }
    }
    learned.toSeq
  }

  /** Reference replay — the same algorithm as a plain driver-side fold
    * over a word-count map (the executable spec's independent witness;
    * also the provenance check for the committed vocab fixture). */
  def trainReference(wordCounts: Map[String, Long], merges: Int,
      minCount: Long = 2L): Seq[Merge] = {
    var seg: Map[Seq[String], Long] = wordCounts.collect {
      case (w, c) if w.nonEmpty => w.map(_.toString) -> c
    }
    val learned = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var step = 0
    var done = false
    while (step < merges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((ps, c) <- seg; i <- 0 until ps.length - 1)
        counts((ps(i), ps(i + 1))) = counts.getOrElse((ps(i), ps(i + 1)), 0L) + c
      val best = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case Some(((l, r), c)) if c >= minCount =>
          step += 1
          learned += Merge(step, l, r, c)
          seg = seg.groupMapReduce { case (ps, _) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < ps.length) {
              if (i + 1 < ps.length && ps(i) == l && ps(i + 1) == r) {
                out += (l + r); i += 2
              } else { out += ps(i); i += 1 }
            }
            out.toSeq
          }(_._2)(_ + _)
        case _ => done = true
      }
    }
    learned.toSeq
  }

  /** The vocabulary a merge list induces: single characters seen in the
    * corpus plus every merged piece, sorted (the
    * [[graft.functions.VocabTokenizer]] load format). */
  def vocabulary(alphabet: Seq[String], learned: Seq[Merge]): Seq[String] =
    (alphabet ++ learned.map(_.piece)).distinct.sorted
}
