// Pathological-page record for the keep-first line-dedup kernel:
//
//   sbt "runMain graft.tools.KeepFirstBench"
//
// The composed position-indexed filter is O(L^2) per document — fine on
// real pages (tens of lines), a stalled-executor hazard on adversarial
// ones (a 20k-line page is 4e8 array_position compares in ONE task).
// This measures native O(L) HashSet kernel vs the composed spelling at
// L in {200, 2000, 20000} over enough rows to time, equality-asserted
// on every width first. Commit as BENCH_KEEPFIRST_r10.json.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object KeepFirstBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("keepfirst-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    for ((lines, rows) <- Seq((200, 20000), (2000, 2000), (20000, 64))) {
      // ~50% duplicate lines, deterministic content
      val df = spark.range(rows).select(col("id"),
          transform(sequence(lit(0), lit(lines - 1)),
            i => concat(lit("line "), pmod(i * 2654435761L + col("id"), lit(lines / 2))))
            .as("lines"))
        .localCheckpoint()
      val native = graft.operators.Dedup.dedupLinesKeepFirst(df, "lines")
        .select("id", "n_lines", "n_kept", "dedup_text")
      val composed = graft.operators.Dedup.dedupLinesKeepFirstComposed(df, "lines")
        .select("id", "n_lines", "n_kept", "dedup_text")
      val diff = native.exceptAll(composed).unionByName(composed.exceptAll(native)).count()
      require(diff == 0, s"spellings disagree on $diff rows at L=$lines")
      for ((name, d) <- Seq("native_hashset" -> native, "composed_position_filter" -> composed)) {
        d.write.format("noop").mode("overwrite").save() // warmup
        val s = (1 to 3).map(_ => time(d.write.format("noop").mode("overwrite").save()))
        println(f"""{"spelling":"$name","lines_per_doc":$lines,"rows":$rows,""" +
          f""""sec_min":${s.min}%.3f,"sec_median":${s.sorted.apply(1)}%.3f}""")
      }
    }
    spark.stop()
  }
}
