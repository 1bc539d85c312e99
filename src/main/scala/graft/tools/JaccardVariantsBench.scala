// Corpus-shape diagnostics for the exact-Jaccard variants and MinHash
// LSH: times the naive shared-shingle self-join vs the prefix-filtered
// AllPairs/PPJoin generator (identical output, spec-asserted) and
// counts q27's candidate-pair volume on a given documents corpus:
//   sbt "runMain graft.tools.JaccardVariantsBench <sfDir> [n] [theta] [reps]"
// The point (VERDICT r06 task 1): on the dense ~30-word synthetic
// corpus the naive join wins and pair counts grow ~quadratically in doc
// count; on the zipf GenTestData mode the ranking must flip (prefix
// pruning works on genuinely rare tokens) and pair volume grows
// ~linearly. One JSON line per run for committed records.
package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup
import graft.queries.Extensions
import graft.sources.Tables

object JaccardVariantsBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JaccardVariantsBench <sfDir> [n] [theta] [reps]")
    val dir = args(0)
    val n = args.lift(1).map(_.toInt).getOrElse(2)
    val theta = args.lift(2).map(_.toDouble).getOrElse(0.3)
    val reps = args.lift(3).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables(spark, dir, "documents")
    val nDocs = docs.count()
    val lshPairs = Dedup.minhashCandidates(docs, "doc_id", "text",
      n = 1, k = Extensions.mhK, bands = Extensions.mhBands).count()

    var exactPairs = -1L
    def time(body: => Long): (Double, Long) = {
      var rows = body // warmup, untimed
      val samples = Vector.fill(reps) {
        val t0 = System.nanoTime()
        rows = body
        (System.nanoTime() - t0) / 1e9
      }
      (samples.min, rows)
    }
    val (naiveSec, naiveRows) =
      time(Dedup.ngramJaccardPairs(docs, "doc_id", "text", n, theta).count())
    val (prefixSec, prefixRows) =
      time(Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", n, theta).count())
    exactPairs = naiveRows
    require(naiveRows == prefixRows,
      s"variant disagreement: naive=$naiveRows prefix=$prefixRows") // belt over the spec's braces
    println(s"""{"sf":"$dir","docs":$nDocs,"n":$n,"theta":$theta,"reps":$reps,""" +
      s""""lsh_candidate_pairs":$lshPairs,"exact_pairs":$exactPairs,""" +
      f""""naive_sec":$naiveSec%.3f,"prefix_sec":$prefixSec%.3f,""" +
      f""""prefix_speedup":${naiveSec / prefixSec}%.2f}""")
    spark.stop()
  }
}
