// Scratch profiler for the q27 bench shape:
//   sbt "runMain graft.tools.ProfileQ27 <sfDir>"
// Times the declared query (candidates + total ORDER BY) exactly as
// Bench does (noop write), plus the orderBy-free candidate stage, so
// the sort/exchange cost of the oracle-mandated total order is visible.
package graft.tools

import org.apache.spark.sql.SparkSession

object ProfileQ27 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(tag: String, reps: Int)(body: => Unit): Unit = {
      body // warm
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        body
        println(f"$tag%-24s run$i ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      }
    }
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    val cands = graft.operators.Dedup.minhashCandidates(docs, "doc_id", "text", 1, 12, 2)
    println(s"candidate pairs: ${cands.count()}")
    time("candidates (no order)", 3)(noop(cands))
    time("q27 as benched", 3)(noop(graft.SparkEntry.queries("q27_minhash_lsh")(spark, sfDir)))
    spark.stop()
  }
}
