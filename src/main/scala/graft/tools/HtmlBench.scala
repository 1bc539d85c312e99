// Scale record for the HTML main-content extractor (q194's operator):
//
//   sbt "runMain graft.tools.HtmlBench [sfDir] [dupFactor]"
//
// Times the committed NARROW spelling (per-row HOF chain over the block
// array — zero exchanges) against the tempting EXPLODED spelling
// (posexplode lines → per-line ops → filter → groupBy(doc_id) reassemble
// — one full-corpus shuffle keyed by doc_id, rows = blocks not docs),
// over the deterministic q194 fixture page synthesized from the sf dir's
// documents, optionally replicated dupFactor× (distinct doc ids) for the
// upper decades. Asserts both spellings produce the identical
// (doc_id, n_kept, main_text) relation before timing. One JSON line per
// (rows, spelling); commit the output as BENCH_HTML_r{N}.json.
//
// Why this record matters at 100 TB: extraction runs on EVERY crawled
// page before any gate can drop it — if the extractor costs a shuffle,
// the whole curation chain pays a corpus-wide exchange it never needed.
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.HtmlExtract

object HtmlBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val dup = args.lift(1).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .appName("html-bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"),
        graft.functions.TextFunctions.normalizedWords(col("text")).as("w"))
      .filter(size(col("w")) >= 1)
    val docs = (if (dup <= 1) base
      else base.crossJoin(
          spark.range(dup).select(col("id").as("rep")))
        .select((col("doc_id") * dup + col("rep")).as("doc_id"),
          col("lang"), col("w")))
      .withColumn("html",
        HtmlExtract.synthHtml(col("doc_id"), col("w"), col("lang")))
      .select("doc_id", "html")
      .localCheckpoint() // pin the fixture: time EXTRACTION, not synthesis
    val n = docs.count()

    // committed narrow spelling
    def narrow(): DataFrame =
      HtmlExtract.extract(docs, "html")
        .select(col("doc_id"), col("n_kept"), col("main_text"))

    // exploded spelling: the same rules, but lines become ROWS and the
    // document is reassembled with a corpus-wide doc_id shuffle
    def exploded(): DataFrame = {
      val noScript = regexp_replace(regexp_replace(col("html"),
        HtmlExtract.scriptPat, " "), HtmlExtract.stylePat, " ")
      val lines = split(regexp_replace(noScript, HtmlExtract.blockClosePat, "\n"), "\n")
      val decoded = HtmlExtract.entities.foldLeft(
        regexp_replace(col("l"), HtmlExtract.tagPat, " ")) {
        case (acc, (e, r)) => replace(acc, lit(e), lit(r))
      }
      val txt = trim(regexp_replace(decoded, HtmlExtract.wsPat, " "))
      val alen = aggregate(
        regexp_extract_all(col("l"), lit(HtmlExtract.anchorPat), lit(1)),
        lit(0), (acc, a) => acc + length(regexp_replace(a, HtmlExtract.tagPat, "")))
      docs.select(col("doc_id"), posexplode(lines).as(Seq("p", "l")))
        .select(col("doc_id"), col("p"), txt.as("txt"), alen.as("alen"))
        .filter(length(col("txt")) >= HtmlExtract.minBlockChars &&
          col("alen") * HtmlExtract.linkDenom <= length(col("txt")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          array_join(transform(array_sort(collect_list(struct(col("p"), col("txt")))),
            s => s.getField("txt")), "\n").as("main_text"))
    }

    // equality first — a fast wrong spelling is not a baseline
    val mismatch = narrow().exceptAll(exploded())
      .unionByName(exploded().exceptAll(narrow())).count()
    require(mismatch == 0, s"spellings disagree on $mismatch rows")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    for ((name, mk) <- Seq("narrow_hof" -> (() => narrow()),
        "exploded_shuffle" -> (() => exploded()))) {
      mk().write.format("noop").mode("overwrite").save() // warmup
      val samples = (1 to 3).map(_ =>
        time(mk().write.format("noop").mode("overwrite").save()))
      println(f"""{"spelling":"$name","sf":"$sfDir","dup":$dup,"rows":$n,""" +
        f""""sec_min":${samples.min}%.3f,"sec_median":${samples.sorted.apply(1)}%.3f}""")
    }
    spark.stop()
  }
}
