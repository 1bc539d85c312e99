// Scale-knob measurement for Similarity.semanticDedup: the per-cluster
// pair fanout is the quadratic term (sum over clusters of C(n_i, 2)),
// and the centroid count is the knob that bounds it. This tool times
// the full pipeline at increasing centroid counts on one corpus and
// reports the candidate-pair volume next to the wall time, so the
// "raise the centroid count so clusters stay bounded" claim in the
// scaladoc is a measured curve, not an assertion.
//   sbt "runMain graft.tools.SemanticDedupBench <sfDir> [theta] [cents...]"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Similarity
import graft.sources.Tables

object SemanticDedupBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SemanticDedupBench <sfDir> [theta] [centroidCounts...]")
    val dir = args(0)
    val theta = args.lift(1).map(_.toDouble).getOrElse(0.3)
    val cents = if (args.length > 2) args.drop(2).map(_.toInt).toSeq else Seq(8, 32, 128)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("semantic-dedup-bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables(spark, dir, "embeddings")
    val nVecs = emb.count()
    for (c <- cents) {
      val pred = col("vec_id") < c
      // candidate volume = sum over clusters of C(n_i, 2) — the number
      // of cosine evaluations the within-cluster join performs
      val nz = emb.filter(VectorFunctions.norm(col("embedding")) > 0)
      val centDf = nz.filter(pred)
        .select(col("vec_id").as("cent_id"), col("embedding").as("centv"))
      val cos = VectorFunctions.cosine(col("v"), col("centv"))
      val negcs = when(isnan(cos), lit(Double.NegativeInfinity)).otherwise(-cos)
      val sizes = nz.select(col("vec_id").as("vid"), col("embedding").as("v"))
        .join(broadcast(centDf))
        .select(col("vid"), struct(negcs.as("negcs"), col("cent_id")).as("sc"))
        .groupBy("vid").agg(min(col("sc")).as("m"))
        .groupBy(col("m").getField("cent_id")).count()
      val stats = sizes.agg(
        sum((col("count") * (col("count") - 1) / 2).cast("long")).as("cand_pairs"),
        max(col("count")).as("max_cluster")).head()
      val candPairs = stats.getLong(0)
      val maxCluster = stats.getLong(1)
      val t0 = System.nanoTime()
      val r = Similarity.semanticDedup(emb, "vec_id", "embedding", pred, theta)
      val dups = r.filter(col("is_dup") === 1).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"sf":"$dir","vecs":$nVecs,"centroids":$c,"theta":$theta,""" +
        f""""cand_pairs":$candPairs,"max_cluster":$maxCluster,"dups":$dups,"sec":$sec%.3f}""")
    }
    spark.stop()
  }
}
