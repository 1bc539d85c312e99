package graft

import org.apache.spark.sql.functions._

import graft.operators.{ProductQuantization, Similarity}
import graft.plans.PQExprs
import graft.sources.Tables

/** Product-quantization invariants: code shape/range, bit-exact ADC
  * lookup vs the composed formulation, determinism, and a recall floor
  * against the exact brute-force ranking. */
class ProductQuantizationSpec extends SparkSuite {
  private lazy val emb = Tables(spark, sfDir, "embeddings")
  private lazy val model = ProductQuantization.fit(emb, "embedding", m = 8, k = 16)

  test("encode: one byte code per subspace, all in [0, k)") {
    val enc = ProductQuantization.encode(emb, "vec_id", "embedding", model).cache()
    assert(enc.count() === emb.count())
    assert(enc.filter(size(col("codes")) =!= model.m).count() === 0)
    val outOfRange = enc.select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") >= model.codebooks.head.length)
    assert(outOfRange.count() === 0)
    // vnorm is the exact norm, not a reconstruction
    val normDiff = enc.join(emb, col("vid") === col("vec_id"))
      .select(abs(col("vnorm") - graft.functions.VectorFunctions.norm(col("embedding"))).as("d"))
      .agg(max("d")).head.getDouble(0)
    assert(normDiff < 1e-4, s"stored norm drifted by $normDiff")
  }

  test("encode is deterministic and ragged/short vectors encode to null") {
    import spark.implicits._
    val a = ProductQuantization.encode(emb, "vec_id", "embedding", model)
    val b = ProductQuantization.encode(emb, "vec_id", "embedding", model)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val ragged = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val out = ragged.select(PQExprs.pqEncode(col("embedding"), model.codebooks).as("codes"))
    assert(out.filter(col("codes").isNull).count() === 1,
      "a vector of the wrong dimension must encode to NULL, not truncate")
  }

  test("native ADC sum is bit-exact vs the composed element_at formulation") {
    val enc = ProductQuantization.encode(emb, "vec_id", "embedding", model)
    // one real query's LUT, built exactly like adcTopK builds it
    val cbLit = typedLit(model.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val lut = transform(sequence(lit(0), lit(model.m - 1)), s =>
      transform(element_at(cbLit, s + lit(1)), cvec =>
        graft.functions.VectorFunctions.dot(
          slice(col("qv"), s * lit(model.subDim) + lit(1), lit(model.subDim)), cvec)))
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv")).withColumn("lut", lut).select("lut")
    val composed = aggregate(
      zip_with(col("codes"), col("lut"),
        (c, row) => element_at(row, c.cast("int") + 1)),
      lit(0.0), (acc, x) => acc + x)
    val cmp = enc.crossJoin(broadcast(q))
      .select(PQExprs.pqAdcDot(col("codes"), col("lut")).as("native"), composed.as("ref"))
    assert(cmp.filter(col("native") =!= col("ref")).count() === 0)
    assert(cmp.filter(col("native").isNull).count() === 0)
  }

  test("reranked adc top-k recall@5 clears the floor; shortlist containment holds") {
    val k = 5
    val qPred = col("vec_id") < 10
    val encoded = ProductQuantization.encode(emb, "vec_id", "embedding", model).cache()
    def recallOf(result: org.apache.spark.sql.DataFrame): Double = {
      val ids = result.groupBy("q_id").agg(collect_set(col("c_id")).as("pq_ids"))
      val exact = Similarity.bruteForceTopK(emb.filter(qPred), emb,
          "vec_id", "embedding", k = k)
        .groupBy("q_id").agg(collect_set(col("c_id")).as("exact_ids"))
      exact.join(ids, Seq("q_id"), "left")
        .select((coalesce(size(array_intersect(col("pq_ids"), col("exact_ids"))), lit(0))
          .cast("double") / k).as("r"))
        .agg(avg("r")).head.getDouble(0)
    }
    // pure ADC on near-uniform synthetic embeddings: quantization error
    // swamps the cosine gaps — only a weak floor is claimable
    val pureAdc = recallOf(ProductQuantization.adcTopK(emb.filter(qPred), encoded,
      "vec_id", "embedding", k, model))
    assert(pureAdc > 0.05, s"pure-ADC recall $pureAdc — below even the weak floor")
    // ADC shortlist + exact re-rank: the production path recovers the
    // true neighbors at O(queries × shortlist) float reads
    val reranked = recallOf(ProductQuantization.adcTopKReranked(emb.filter(qPred),
      encoded, emb, "vec_id", "embedding", k, shortlist = 100, model))
    assert(reranked >= 0.7,
      s"reranked recall collapsed to $reranked (pure ADC was $pureAdc)")
    assert(reranked >= pureAdc, "re-ranking must not lose recall")
  }

  test("IVF+PQ: full-probe degenerates to the plain ADC rerank; partial probe clears the floor") {
    val k = 5
    val qPred = col("vec_id") < 10
    val nCentroids = 8
    // probing EVERY list = an un-pruned ADC scan over identical codes,
    // scores, and tie-breaks — the result must be row-identical to
    // adcTopKReranked with the same shortlist (exactness of the
    // composition, not a recall statement)
    val full = ProductQuantization.ivfAdcTopKReranked(emb.filter(qPred), emb,
        "vec_id", "embedding", k, nProbe = nCentroids, nCentroids = nCentroids,
        shortlist = 50, model)
      .select("q_id", "c_id", "rn").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val encoded = ProductQuantization.encode(emb, "vec_id", "embedding", model)
    val plain = ProductQuantization.adcTopKReranked(emb.filter(qPred), encoded, emb,
        "vec_id", "embedding", k, shortlist = 50, model)
      .select("q_id", "c_id", "rn").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(full === plain)
    // partial probe: recall bounded by list pruning but must clear the
    // declared gate's floor on the gate corpus
    val part = ProductQuantization.ivfAdcTopKReranked(emb.filter(qPred), emb,
      "vec_id", "embedding", k, nProbe = 4, nCentroids = 16, shortlist = 100, model)
    val exact = Similarity.bruteForceTopK(emb.filter(qPred), emb,
        "vec_id", "embedding", k = k)
      .groupBy("q_id").agg(collect_set(col("c_id")).as("exact_ids"))
    val rec = exact
      .join(part.groupBy("q_id").agg(collect_set(col("c_id")).as("got")), Seq("q_id"), "left")
      .select((coalesce(size(array_intersect(col("got"), col("exact_ids"))), lit(0))
        .cast("double") / k).as("r"))
      .agg(avg("r")).head.getDouble(0)
    assert(rec >= 0.4, s"IVFPQ recall $rec below gate floor")
  }

  test("residual coding: decomposition is exact pre-quantization; shortlist=k recall not worse than raw codes") {
    import spark.implicits._
    // dot(q,v) == dot(q,c) + dot(q, v-c) — the identity residual search
    // relies on, checked with UNquantized residuals to fp tolerance
    val v = Seq((1L, Seq(1.0f, 2.0f, 3.0f, 4.0f))).toDF("id", "v")
    val c = Seq(Seq(0.5, 1.5, 2.5, 3.5)).toDF("centv")
    val q = Seq(Seq(2.0f, -1.0f, 0.5f, 1.0f)).toDF("qv")
    val row = v.crossJoin(c).crossJoin(q).select(
      graft.functions.VectorFunctions.dot(col("qv"), col("v")).as("direct"),
      (graft.functions.VectorFunctions.dot(col("qv"), col("centv")) +
        graft.functions.VectorFunctions.dot(col("qv"),
          zip_with(col("v"), col("centv"), (x, y) => x.cast("double") - y))).as("decomposed"))
      .head
    assert(math.abs(row.getDouble(0) - row.getDouble(1)) < 1e-9)

    // shortlist=k (no re-rank slack): recall reflects the ADC ranking
    // itself. Residual codes quantize a smaller-magnitude signal on the
    // same budget, so they must not rank worse than raw codes.
    val k = 5
    val qs = emb.filter(col("vec_id") < 10)
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val exact = Similarity.bruteForceTopK(qs, emb, "vec_id", "embedding", k)
        .groupBy("q_id").agg(collect_set(col("c_id")).as("e"))
      exact.join(df.groupBy("q_id").agg(collect_set(col("c_id")).as("g")), Seq("q_id"), "left")
        .select((coalesce(size(array_intersect(col("g"), col("e"))), lit(0))
          .cast("double") / k).as("r"))
        .agg(avg("r")).head.getDouble(0)
    }
    val nCent = 8
    val (residIdx, residModel) = ProductQuantization.buildIvfPQResidualIndex(
      emb, "vec_id", "embedding", nCentroids = nCent, m = 8, kCodes = 16)
    val residual = recallOf(ProductQuantization.ivfPQResidualSearch(qs, residIdx, emb,
      "vec_id", "embedding", k, nProbe = nCent, shortlist = k, residModel))
    val rawIdx = ProductQuantization.buildIvfPQIndex(emb, "vec_id", "embedding",
      nCentroids = nCent, model)
    val raw = recallOf(ProductQuantization.ivfPQSearch(qs, rawIdx, emb,
      "vec_id", "embedding", k, nProbe = nCent, shortlist = k, model))
    assert(residual >= raw - 0.05,
      s"residual-coded shortlist recall $residual fell below raw-coded $raw")
  }

  test("IVFPQ index persisted partitioned by cent_id: probe scan partition-prunes") {
    // the 100 TB deployment shape: encodedLists written once at ingest,
    // partitioned by list id — a probe then reads ONLY its lists'
    // directories (partition pruning), never the full code table
    val index = ProductQuantization.buildIvfPQIndex(emb, "vec_id", "embedding",
      nCentroids = 8, model)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString
    graft.sources.Sinks.writePartitioned(index.encodedLists, dir, Seq("cent_id"))
    val back = spark.read.parquet(dir)
    assert(back.count() === index.encodedLists.count())
    val probed = back.filter(col("cent_id").isin(0, 3))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cent_id"), plan)
    assert(probed.count() ===
      index.encodedLists.filter(col("cent_id").isin(0, 3)).count())
    // the persisted codes round-trip bit-exactly (ARRAY<TINYINT> + FLOAT norm)
    val orig = index.encodedLists.select("vid", "codes", "vnorm")
    assert(back.select("vid", "codes", "vnorm").exceptAll(orig).isEmpty)
  }

  test("out-of-range code and length-mismatched LUT score NULL, never a wrong sum") {
    import spark.implicits._
    // Seq[Byte] (not Array[Byte], which would encode as BINARY)
    val rows = Seq(
      (Seq(0.toByte, 1.toByte), Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)), "ok"),
      (Seq(0.toByte, 5.toByte), Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)), "code_oob"),
      (Seq(0.toByte), Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)), "len_mismatch"))
      .toDF("codes", "lut", "tag")
    val out = rows.select(col("tag"), PQExprs.pqAdcDot(col("codes"), col("lut")).as("s"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out("ok") === 1.0 + 4.0)
    assert(out("code_oob") === null)
    assert(out("len_mismatch") === null)
  }
}
