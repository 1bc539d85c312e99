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

    val ks = Seq(1, 2, 4, 8)
    val results = ks.map { k =>
      val n = links(k)
      pipeline(k).count() // warm
      val sec = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        pipeline(k).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      (k, n, sec)
    }
    val base = results.head
    val rows = results.map { case (k, n, sec) =>
      f""""k$k":{"links":$n,"sec":$sec%.3f,"links_ratio":${n.toDouble / base._2}%.2f,"sec_ratio":${sec / base._3}%.2f}"""
    }
    println(s"""{"metric":"anchor_scale","sf":"$sfDir",${rows.mkString(",")}}""")
    spark.stop()
  }
}
