package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.TextAnalysis
import graft.sources.Tables
import graft.streaming.EventStreams

/** The curation operators are streaming-safe: the same quality-gating
  * transform produces identical results through a real streaming query
  * and in batch (the repo's batch-equivalence contract), and the
  * scan-parallelism guard does not break on streaming plans (streaming
  * sources have no inputFiles). */
class StreamingCurationSpec extends SparkSuite {

  test("quality-gating pipeline: stream == batch, append mode, per-batch observe metrics") {
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text", "lang")
    def gate(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      EventStreams.withInputCounter(
        TextAnalysis.qualityScore(df, "doc_id", "text", keep = Seq("lang")), "scored")
        .filter(col("score") >= 0.5 && col("n_tok") >= 10)
        .select("doc_id", "lang", "n_tok", "score")
    val batch = gate(docs).collect().map(_.toSeq).toSet
    assert(batch.nonEmpty, "gate must pass some docs on the fixture corpus")
    val streamed = EventStreams.replayThroughStream(spark, docs, gate,
        "curation_stream", OutputMode.Append())
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }

  test("Gopher battery is streaming-composable: repetition + quality gates, stream == batch") {
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
    // the native per-row kernel makes gopherRepetition a NARROW map, so
    // it composes into an Append-mode streaming ingest gate — the
    // exploded distributed formulation could not (multi-stage agg)
    def repGate(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      TextAnalysis.gopherRepetition(df, "doc_id", "text").filter(col("gopher_keep"))
    val repBatch = repGate(docs).collect().map(_.toSeq).toSet
    assert(repBatch.nonEmpty)
    val repStream = EventStreams.replayThroughStream(spark, docs, repGate,
        "gopher_rep_stream", OutputMode.Append())
      .collect().map(_.toSeq).toSet
    assert(repStream === repBatch)
    def qualGate(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      TextAnalysis.gopherQuality(df, "doc_id", "text")
        .filter(col("rule_wordcount") && col("rule_meanlen"))
    val qualBatch = qualGate(docs).collect().map(_.toSeq).toSet
    assert(qualBatch.nonEmpty)
    val qualStream = EventStreams.replayThroughStream(spark, docs, qualGate,
        "gopher_qual_stream", OutputMode.Append())
      .collect().map(_.toSeq).toSet
    assert(qualStream === qualBatch)
  }

  test("HTML extraction is streaming-composable: crawl-ingest extract gate, stream == batch") {
    import graft.operators.HtmlExtract
    // the extractor is a pure narrow projection (plan-asserted in
    // PlanAssertionsSpec), so it slots into an Append-mode crawl
    // ingest with no state and no watermark — the front door of the
    // streaming curation chain, same batch-equivalence contract
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"),
        graft.functions.TextFunctions.normalizedWords(col("text")).as("w"))
      .filter(size(col("w")) >= 1)
      .withColumn("html",
        HtmlExtract.synthHtml(col("doc_id"), col("w"), col("lang")))
      .select("doc_id", "lang", "html")
    def extractGate(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      HtmlExtract.extract(df, "html")
        .filter(col("n_kept") >= 1 && col("main_len") >= 100)
        .select("doc_id", "lang", "n_kept", "main_len", "main_text")
    val batch = extractGate(docs).collect().map(_.toSeq).toSet
    assert(batch.nonEmpty, "the fixture pages must pass the extract gate")
    val streamed = EventStreams.replayThroughStream(spark, docs, extractGate,
        "html_extract_stream", OutputMode.Append())
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }

  test("LSH gate: band-directory ingest == batch gate under in-order replay; real stream agrees") {
    import graft.operators.Dedup
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
    val batch = Dedup.lshDedupGate(docs, "doc_id", "text", n = 2, k = 12, bands = 2)
      .collect().map(_.toSeq).toSet
    assert(batch.exists(_.last == true), "fixture corpus must contain LSH dups")
    // three id-ordered micro-batches, called exactly as the foreachBatch sink does
    val base = java.nio.file.Files.createTempDirectory("lsh_gate").toString
    val cuts = Seq((0L, 150L), (150L, 300L), (300L, Long.MaxValue))
    cuts.zipWithIndex.foreach { case ((lo, hi), i) =>
      EventStreams.lshGateBatch(spark,
        docs.filter(col("doc_id") >= lo && col("doc_id") < hi),
        "doc_id", "text", s"$base/state", s"$base/out", i.toLong)
    }
    val incr = spark.read.parquet(s"$base/out")
      .select("doc_id", "first_owner", "is_dup").collect().map(_.toSeq).toSet
    assert(incr === batch)
    // retried batch: re-running the last id overwrites its own partition,
    // probes exclude it — output unchanged (exactly-once contract)
    EventStreams.lshGateBatch(spark,
      docs.filter(col("doc_id") >= 300L),
      "doc_id", "text", s"$base/state", s"$base/out", 2L)
    val retried = spark.read.parquet(s"$base/out")
      .select("doc_id", "first_owner", "is_dup").collect().map(_.toSeq).toSet
    assert(retried === batch)
    // the real streaming query (file source, one micro-batch) agrees too
    val base2 = java.nio.file.Files.createTempDirectory("lsh_gate_stream").toString
    docs.write.parquet(s"$base2/in")
    val src = spark.readStream.schema(docs.schema).parquet(s"$base2/in")
    val q = EventStreams.lshGateStream(src, "doc_id", "text",
      s"$base2/state", s"$base2/out", s"$base2/ckpt")
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.parquet(s"$base2/out")
      .select("doc_id", "first_owner", "is_dup").collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }

  test("Misra-Gries sketch streams: Complete-mode counters keep the MG guarantee") {
    import spark.implicits._
    val k = 8
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
    def tokens(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(graft.functions.TextFunctions.normalizedWords(col("text"))).as("w"))
    def sketch(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val ds = tokens(df).as[String]
      ds.select(new graft.operators.HeavyHitters.MisraGries(k).toColumn.name("mg")).toDF()
    }
    val exact = tokens(docs).groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    // the product output encoder flattens MGState into (total, counters)
    val st = EventStreams.replayThroughStream(spark, docs, sketch,
        "mg_stream", OutputMode.Complete())
      .collect().last
    assert(st.getLong(0) == total, "sketch total must be the exact stream length")
    val counters = st.getMap[String, Long](1)
    assert(counters.nonEmpty && counters.size <= k)
    // MG guarantee on the STREAMED state: true - total/(k+1) <= counter <= true
    counters.foreach { case (w, c) =>
      assert(c <= exact(w) && c >= exact(w) - total / (k + 1), s"$w: $c vs ${exact(w)}")
    }
    // every token strictly above the threshold holds a counter
    exact.foreach { case (w, n) =>
      if (n > total / (k + 1)) assert(counters.contains(w), s"missing heavy hitter $w ($n)")
    }
  }

  test("bounded weighted-sample sketch: streaming Complete mode == batch sample") {
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "n_chars")
    val k = 12
    def sketch(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      graft.operators.Sampling.weightedSampleSketch(df, "doc_id", col("n_chars") + 1, k)
    val batchIds = sketch(docs).head.getSeq[Long](0)
    // the sketch must reproduce the plain top-k sample EXACTLY, order included
    val direct = graft.operators.Sampling
      .weightedSample(docs, "doc_id", col("n_chars") + 1, k)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(batchIds == direct, s"sketch $batchIds vs direct $direct")
    // and be partitioning-invariant (mergeability)
    assert(sketch(docs.repartition(13)).head.getSeq[Long](0) == direct)
    // streaming twin: Complete-mode aggregate over the replayed corpus
    val streamed = EventStreams.replayThroughStream(spark, docs, sketch,
        "sample_sketch_stream", OutputMode.Complete())
      .collect()
    assert(streamed.last.getSeq[Long](0) == direct, "final streamed sample != batch")
  }

  test("Aho-Corasick blocklist screen: stream == batch (narrow, zero-state DFA gate)") {
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
    val pats = Seq("sort merge", "merge", "spark", "a a")
    def screen(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      graft.operators.Blocklist.screen(df, "doc_id", "text", pats)
        .filter(col("flagged"))
        .select(col("doc_id"), col("hits").cast("string").as("hits"),
          col("total_hits"), col("n_patterns_hit"))
    val batch = screen(docs).collect().map(_.toSeq).toSet
    assert(batch.nonEmpty, "fixture corpus must trip the blocklist")
    val streamed = EventStreams.replayThroughStream(spark, docs, screen,
        "blocklist_stream", OutputMode.Append())
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }

  test("hashed-bigram quality classifier: stream == batch (narrow, zero-state)") {
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
    def score(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      graft.operators.QualityClassifier.hashedBigramScore(df, "doc_id", "text")
    val batch = score(docs).collect().map(_.toSeq).toSet
    assert(batch.nonEmpty)
    val streamed = EventStreams.replayThroughStream(spark, docs, score,
        "classifier_stream", OutputMode.Append())
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }
}
