// Scratch profiler (round 6): stage-level timing of the connected-
// components whales (q63/q63b/q66) and the multimodal query (q40).
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfileCC {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      val rows = r match { case n: Long => s"   rows=$n"; case _ => "" }
      println(f"[prof] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s$rows")
    }

    val docs = graft.sources.Tables(spark, sfDir, "documents")
    docs.count() // warm scan

    // naive vs prefix-filtered exact jaccard pair generation
    for ((n, th) <- Seq((2, 0.3), (3, 0.5))) {
      time(f"naive pairgen n=$n th=$th count")(
        graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", n, th).count())
      time(f"prefix pairgen n=$n th=$th count")(
        graft.operators.Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", n, th).count())
      time(f"brute pairgen n=$n th=$th count")(
        graft.operators.Dedup.ngramJaccardPairsBrute(docs, "doc_id", "text", n, th).count())
    }

    // q63 stages
    val pairs = graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2, theta = 0.3)
    time("q63 pairgen (theta .3) count")(pairs.count())
    val pairsP = pairs.select("doc_a", "doc_b").persist()
    time("q63 pairs persist")(pairsP.count())
    time("q63 CC propagation only")(noop(
      graft.operators.Dedup.dedupClusters(pairsP, docs.select("doc_id"))))
    time("q63b CC star only")(noop(
      graft.operators.Dedup.dedupClustersStar(pairsP, docs.select("doc_id"))))
    pairsP.unpersist()

    // q66 stages
    val cands = graft.operators.Dedup.minhashCandidates(docs, "doc_id", "text",
      n = 2, k = graft.queries.Extensions.mhK, bands = graft.queries.Extensions.mhBands)
    time("q66 candidates count")(cands.count())
    val verified = graft.operators.Dedup.jaccardRefine(cands, docs, "doc_id", "text", n = 2, theta = 0.5)
    time("q66 refine count")(verified.count())
    val verP = verified.select("doc_a", "doc_b").persist()
    time("q66 verified persist")(verP.count())
    time("q66 CC star only")(noop(
      graft.operators.Dedup.dedupClustersStar(verP, docs.select("doc_id"))))
    verP.unpersist()

    time("q63 declared e2e")(noop(graft.SparkEntry.queries("q63_dedup_clusters")(spark, sfDir)))
    time("q63b declared e2e")(noop(graft.SparkEntry.queries("q63b_dedup_clusters_star")(spark, sfDir)))
    time("q66 declared e2e")(noop(graft.SparkEntry.queries("q66_dedup_pipeline")(spark, sfDir)))

    // q40 stages
    val images = graft.operators.Multimodal.synthesizeAssets(docs, "doc_id", "text", "image")
    val videos = graft.operators.Multimodal.synthesizeAssets(
      docs.withColumn("vtext", reverse(col("text"))), "doc_id", "vtext", "video")
    time("q40 image synth+decode")(graft.operators.Multimodal.decodeFeatures(images).count())
    time("q40 video synth+decode")(graft.operators.Multimodal.decodeFeatures(videos).count())
    time("q40 declared e2e")(noop(graft.SparkEntry.queries("q40_multimodal")(spark, sfDir)))

    spark.stop()
  }
}
