// Scratch profiler: sbt "runMain graft.tools.ProfileMinhash <sfDir>"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(body: => Long): Unit = {
      body // warm
      val t0 = System.nanoTime(); val n = body
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s   rows=$n")
    }
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    time("scan+tokenize")(docs.select(explode(
      graft.functions.TextFunctions.normalizedWords(col("text")))).count())
    time("signatures") {
      graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text", 1, 12).count()
    }
    time("candidates e2e") {
      graft.operators.Dedup.minhashCandidates(docs, "doc_id", "text", 1, 12, 2).count()
    }
    spark.stop()
  }
}
