// Capped-vs-uncapped MinHash-LSH candidate generation record:
//
//   sbt "runMain graft.tools.MinhashCapBench <sfDir> <reps> [maxBandDf]"
//
// Times the DECLARED q27 shape (candidates + total ORDER BY, noop sink)
// both without a band-df cap (the round-7 configuration whose candidate
// volume detonates quadratically on dense corpora — 291 M pairs / 595 s
// at sf1) and with the production cap (Extensions.mhMaxBandDf unless
// overridden), printing min/median/spread and the candidate count for
// each so the record ties wall time to output volume. One JSON line per
// variant.
package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup
import graft.queries.Extensions
import graft.sources.Tables

object MinhashCapBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: MinhashCapBench <sfDir> <reps> [maxBandDf]")
    val sfDir = args(0)
    val reps = args(1).toInt
    val cap = args.lift(2).map(_.toLong).getOrElse(Extensions.mhMaxBandDf)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("minhash-cap-bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def loadavg(): Double =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }

    def declaredShape(maxBandDf: Long) =
      Dedup.minhashCandidates(Tables(spark, sfDir, "documents"), "doc_id", "text",
          n = 1, k = Extensions.mhK, bands = Extensions.mhBands, maxBandDf = maxBandDf)
        .orderBy("doc_a", "doc_b")

    for ((tag, bandDf) <- Seq("uncapped" -> Long.MaxValue, s"capped_$cap" -> cap)) {
      val pairs = declaredShape(bandDf).count() // also the warmup pass
      val load0 = loadavg()
      val samples = Vector.fill(reps) {
        val t0 = System.nanoTime()
        declaredShape(bandDf).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val spread = if (samples.head > 0) (samples.last - samples.head) / samples.head else 0.0
      println(f"""{"variant":"$tag","sf":"$sfDir","pairs":$pairs,""" +
        f""""min_sec":${samples.head}%.3f,"median_sec":${samples(samples.length / 2)}%.3f,""" +
        f""""spread":$spread%.3f,"reps":$reps,"loadavg":$load0%.2f}""")
    }
    spark.stop()
  }
}
