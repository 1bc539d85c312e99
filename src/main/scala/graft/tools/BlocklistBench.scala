package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bake-off for the Aho–Corasick blocklist screen
  * ([[graft.operators.Blocklist]] / [[graft.plans.AhoCorasick]])
  * against the composed alternatives, across PATTERN-LIST SIZE — the
  * axis the DFA is built for:
  *
  *  - `ac_screen`: one narrow map, O(len + matches) per doc regardless
  *    of pattern count (the production shape);
  *  - `hof_counts`: semantic twin via one positional-scan
  *    higher-order-function column PER PATTERN (the form the q186
  *    oracle uses) — O(len × patterns) per doc plus a plan column per
  *    term;
  *  - `contains_flags`: the cheap existence-only screen most pipelines
  *    actually write (N `contains` columns) — weaker semantics (no
  *    counts), still one scan per pattern.
  *
  * Patterns are drawn deterministically from the corpus itself (the
  * most frequent normalized words, so every variant does real matching
  * work), padded with two-word phrases for trie depth.
  *
  * {{{
  * sbt "runMain graft.tools.BlocklistBench /tmp/zipf_sf1 3 10,100,1000"
  * }}}
  */
object BlocklistBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/zipf_sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val sizes = args.lift(2).getOrElse("10,100,1000").split(",").map(_.toInt).toSeq

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).cache()
    val nDocs = docs.count()

    // deterministic pattern pool: most frequent words (ties by word),
    // every one guaranteed to hit; the second half become two-word
    // phrases for trie depth
    val maxN = sizes.max
    val words = docs
      .select(explode(graft.functions.TextFunctions.normalizedWords(col("text"))).as("w"))
      .groupBy("w").count()
      .orderBy(desc("count"), asc("w"))
      .limit(maxN).collect().map(_.getString(0)).toSeq
    def patternsOf(n: Int): Seq[String] = {
      val half = n / 2
      val singles = words.take(n - half)
      val phrases = words.take(half).zip(words.slice(1, half + 1))
        .map { case (a, b) => s"$a $b" }
      (singles ++ phrases).distinct.take(n)
    }

    def time(label: String)(mk: => DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val samples = Vector.fill(reps)(once()).sorted
      println(f"[blocklist] $label%-28s min=${samples.head}%8.3f  median=${samples(samples.length / 2)}%8.3f  docs=$nDocs  sf=$sfDir")
    }

    sizes.foreach { n =>
      val pats = patternsOf(n)
      time(s"ac_screen n=$n") {
        graft.operators.Blocklist.screen(docs, "doc_id", "text", pats)
      }
      // the composed forms build one column per pattern: past a few
      // hundred terms codegen itself becomes the bottleneck — cap at
      // 100 and let the record say so instead of timing a janino stall
      if (n <= 100) time(s"hof_counts n=$n") {
        val cols = pats.zipWithIndex.map { case (p, i) =>
          val q = p.replace("'", "''")
          expr(s"size(filter(sequence(1, greatest(length(text) - ${p.length} + 1, 0)), " +
            s"i -> substring(text, i, ${p.length}) = '$q'))").cast("long").as(s"c$i")
        }
        docs.select((col("doc_id") +: cols): _*)
      }
      time(s"contains_flags n=$n") {
        val cols = pats.zipWithIndex.map { case (p, i) =>
          col("text").contains(p).as(s"f$i")
        }
        docs.select((col("doc_id") +: cols): _*)
      }
    }
    spark.stop()
  }
}
