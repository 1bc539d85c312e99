// Scale dry-run for the round-10 crawl-side operators:
//
//   sbt "runMain graft.tools.CrawlOpsBench"
//
// URL canonicalization, the Luhn screen and code detection are all
// narrow single-pass regex/HOF projections — their cost MUST grow
// linearly in rows with a flat per-row rate. This measures each at
// 5k / 50k / 500k docs (the q197/q198/q200 fixtures, replicated with
// distinct ids) and prints sec and us/row; a superlinear bend would
// mean a hidden rescan (the q187 nation-blocking lesson). Commit as
// BENCH_CRAWLOPS_r10.json.
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object CrawlOpsBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .appName("crawlops-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val base = graft.sources.Tables(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text", "lang")
    for (dup <- Seq(1, 10, 100)) {
      val docs = (if (dup <= 1) base
        else base.crossJoin(spark.range(dup).select(col("id").as("rep")))
          .select((col("doc_id") * dup + col("rep")).as("doc_id"),
            col("text"), col("lang")))
        .localCheckpoint()
      val n = docs.count()
      val d = col("doc_id").cast("string")
      val urls = docs.select(col("doc_id"), explode(array(
        concat(lit("https://Shop.Example.COM:443/p/"), d, lit("/?utm_source=f&fbclid=x"), d),
        concat(lit("https://shop.example.com/p/"), d, lit("/")),
        concat(lit("https://SHOP.example.com/p/"), d, lit("?page=2&gclid=z#f")))).as("url"))
        .localCheckpoint()
      val withPan = docs.select(col("doc_id"),
        concat(col("text"), lit(" pay 4111111111111111 ref 4111111111111112")).as("text"))
        .localCheckpoint()
      val cases: Seq[(String, () => DataFrame, Long)] = Seq(
        ("url_canonicalize", () => graft.operators.UrlCanon
          .canonicalGroups(urls, "doc_id", "url"), n * 3),
        ("luhn_screen", () => graft.operators.TextAnalysis
          .luhnScreen(withPan, "doc_id", "text"), n),
        ("code_detect", () => graft.operators.TextAnalysis
          .codeSignals(docs, "doc_id", "text"), n))
      for ((name, mk, rows) <- cases) {
        mk().write.format("noop").mode("overwrite").save() // warmup
        val s = (1 to 3).map(_ => time(mk().write.format("noop").mode("overwrite").save()))
        println(f"""{"op":"$name","rows":$rows,"sec_min":${s.min}%.3f,""" +
          f""""us_per_row":${s.min * 1e6 / rows}%.2f}""")
      }
    }
    spark.stop()
  }
}
