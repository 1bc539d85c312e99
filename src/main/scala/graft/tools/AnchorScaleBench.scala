package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.HtmlExtract

/** Pins q212's scaling SHAPE (round-13 verdict task 5): the r12 decade
  * record showed 2.37× wall at 10× documents and asked whether anchor
  * extraction is linear in TOTAL LINKS (the honest cost driver — sf0.1
  * pages carry more links per doc than sf0.01's, so the doc ratio
  * understates the work ratio). This tool holds the CORPUS fixed
  * (sf0.01 documents) and scales only the LINK COUNT per page (K extra
  * "See also" paragraphs, 2 anchors each), timing the full q212
  * pipeline — extract → resolve → (host, path) rollup → top anchor —
  * fresh-plan min-of-3 per K. Linear shape = sec ratios track link
  * ratios, not a super-linear bend.
  *
  * {{{
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.tools.AnchorScaleBench"
  * }}}
  */
object AnchorScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val H = HtmlExtract

    val d = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"),
        TextFunctions.normalizedWords(col("text")).as("w"))
      .filter(size(col("w")) >= 1)
      .localCheckpoint() // pin the input so per-K timings share bytes

    def pipeline(k: Int): DataFrame = {
      val did = col("doc_id").cast("string")
      val extra = (0 until k).map(i => concat(
        lit("<p>See also <a href=\"https://h"), (col("doc_id") % 3).cast("string"),
        lit(s".example.com/topic$i/"), col("lang"), lit("\">"), col("lang"),
        lit(s" hub $i"), lit("</a> and <a href=\"/doc/"), did,
        lit(s"/rel$i\">notes $i for "), did, lit("</a>.</p>")))
      val page = concat(
        (H.synthHtml(col("doc_id"), col("w"), col("lang")) +: extra): _*)
      val resolved = d
        .select(col("doc_id"),
          concat(lit("h"), (col("doc_id") % 7).cast("string"),
            lit(".example.com")).as("src_host"),
          explode(H.links(page)).as("lnk"))
        .filter(col("lnk.href") =!= "")
        .select(col("doc_id"), col("src_host"),
          H.resolveHref(col("src_host"), col("lnk.href")).as("t"),
          col("lnk.atxt").as("atxt"))
        .select(col("doc_id"), col("src_host"),
          col("t.host").as("host"), col("t.path").as("path"), col("atxt"))
      val perAnchor = resolved.groupBy("host", "path", "atxt")
        .agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("host", "path").orderBy(col("cnt").desc, col("atxt").asc)
      val top = perAnchor.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      resolved.groupBy("host", "path")
        .agg(count(lit(1)).as("n_inlinks"))
        .join(top.select("host", "path", "cnt"), Seq("host", "path"))
    }

    def links(k: Int): Long = {
      val did = col("doc_id").cast("string")
      val extra = (0 until k).map(i => concat(
        lit("<p>See also <a href=\"https://h"), (col("doc_id") % 3).cast("string"),
        lit(s".example.com/topic$i/"), col("lang"), lit("\">"), col("lang"),
        lit(s" hub $i"), lit("</a> and <a href=\"/doc/"), did,
        lit(s"/rel$i\">notes $i for "), did, lit("</a>.</p>")))
      val page = concat(
        (H.synthHtml(col("doc_id"), col("w"), col("lang")) +: extra): _*)
      d.select(size(H.links(page)).cast("long").as("n")).agg(sum("n")).head().getLong(0)
    }

    // body-scaled leg: REPLICATE the page body b times at FIXED link
    // count — if the wall tracks b, the cost driver is html BYTES
    // scanned by the anchor/tag regexes, not the links extracted
    def pipelineBody(b: Int): DataFrame = {
      val did = col("doc_id").cast("string")
      val body = H.synthHtml(col("doc_id"), col("w"), col("lang"))
      // strip the body's own anchors so replication holds links fixed:
      // keep the raw text blocks only (no <a ...> survives the strip)
      val bodyNoLinks = regexp_replace(body, "(?is)<a[^>]*>.*?</a>", " ")
      val tail = concat(
        lit("<p>See also <a href=\"https://h"), (col("doc_id") % 3).cast("string"),
        lit(".example.com/topic/"), col("lang"), lit("\">"), col("lang"),
        lit(" hub</a> and <a href=\"/doc/"), did, lit("/related\">notes for "),
        did, lit("</a>.</p>"))
      val page = concat((Seq.fill(b)(bodyNoLinks) :+ tail): _*)
      val resolved = d
        .select(col("doc_id"),
          concat(lit("h"), (col("doc_id") % 7).cast("string"),
            lit(".example.com")).as("src_host"),
          explode(H.links(page)).as("lnk"))
        .filter(col("lnk.href") =!= "")
        .select(col("doc_id"), col("src_host"),
          H.resolveHref(col("src_host"), col("lnk.href")).as("t"),
          col("lnk.atxt").as("atxt"))
        .select(col("doc_id"), col("src_host"),
          col("t.host").as("host"), col("t.path").as("path"), col("atxt"))
      val perAnchor = resolved.groupBy("host", "path", "atxt")
        .agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("host", "path").orderBy(col("cnt").desc, col("atxt").asc)
      val top = perAnchor.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      resolved.groupBy("host", "path")
        .agg(count(lit(1)).as("n_inlinks"))
        .join(top.select("host", "path", "cnt"), Seq("host", "path"))
    }

    def timed(mk: () => DataFrame): Double = {
      mk().count() // warm
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk().count()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    pipeline(1).count(); pipeline(1).count() // global JVM/codegen warmup

    val ks = Seq(1, 2, 4, 8)
    val linkLeg = ks.map { k => (k, links(k), timed(() => pipeline(k))) }
    val bodyLeg = ks.map { b => (b, timed(() => pipelineBody(b))) }
    val lb = linkLeg.head
    val bb = bodyLeg.head
    val linkRows = linkLeg.map { case (k, n, sec) =>
      f""""k$k":{"links":$n,"sec":$sec%.3f,"links_ratio":${n.toDouble / lb._2}%.2f,"sec_ratio":${sec / lb._3}%.2f}"""
    }
    val bodyRows = bodyLeg.map { case (b, sec) =>
      f""""b$b":{"bytes_ratio":$b.0,"sec":$sec%.3f,"sec_ratio":${sec / bb._2}%.2f}"""
    }
    println(s"""{"metric":"anchor_scale","sf":"$sfDir","links_scaled":{${linkRows.mkString(",")}},"body_scaled":{${bodyRows.mkString(",")}}}""")
    spark.stop()
  }
}
