package graft

import org.apache.spark.sql.functions._

import graft.operators.ProductQuantization
import graft.sources.Tables

/** OPQ (learned-rotation PQ) invariants: the rotation is orthonormal,
  * an identity rotation reproduces plain PQ exactly, the learned
  * rotation does not lose quantization quality vs plain PQ on the
  * fixture corpus, and the shortlist-scaling rule is monotone in the
  * corpus size with sane floors/caps. */
class OPQSpec extends SparkSuite {
  private lazy val emb = Tables(spark, sfDir, "embeddings")
  private lazy val opq =
    ProductQuantization.fitOPQ(emb, "embedding", m = 8, k = 16, opqIters = 4)

  test("learned rotation is orthonormal (R Rᵀ = I to 1e-9)") {
    val r = opq.rotation
    val d = r.length
    var worst = 0.0
    for (i <- 0 until d; j <- 0 until d) {
      var acc = 0.0
      var t = 0
      while (t < d) { acc += r(i)(t) * r(j)(t); t += 1 }
      val want = if (i == j) 1.0 else 0.0
      worst = math.max(worst, math.abs(acc - want))
    }
    assert(worst < 1e-9, s"R Rᵀ deviates from I by $worst")
  }

  test("identity rotation reproduces the plain PQ path bit-for-bit") {
    val pq = ProductQuantization.fit(emb, "embedding", m = 8, k = 16)
    val d = pq.codebooks.length * pq.subDim
    val eye = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val idOpq = ProductQuantization.OPQModel(eye, pq)
    val a = ProductQuantization
      .adcTopKReranked(emb.filter(col("vec_id") < 4),
        ProductQuantization.encode(emb, "vec_id", "embedding", pq),
        emb, "vec_id", "embedding", k = 5, shortlist = 20, pq)
    val b = ProductQuantization
      .adcTopKRerankedOPQ(emb.filter(col("vec_id") < 4),
        ProductQuantization.encodeOPQ(emb, "vec_id", "embedding", idOpq),
        emb, "vec_id", "embedding", k = 5, shortlist = 20, idOpq)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("learned rotation does not increase quantization error vs plain PQ") {
    // mean squared reconstruction error over the corpus, computed for
    // plain PQ and for OPQ in the rotated space (where its codes live)
    val pq = ProductQuantization.fit(emb, "embedding", m = 8, k = 16)
    def mse(df: org.apache.spark.sql.DataFrame, vecCol: String,
        model: ProductQuantization.PQModel): Double = {
      val cbLit = typedLit(model.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
      val enc = df.select(col(vecCol).as("v"),
        graft.plans.PQExprs.pqEncode(col(vecCol), model.codebooks).as("codes"))
      val recon = flatten(zip_with(col("codes"),
        sequence(lit(1), lit(model.m)),
        (c, s) => element_at(element_at(cbLit, s), c.cast("int") + 1)))
      enc.filter(col("codes").isNotNull)
        .select(aggregate(zip_with(col("v"), recon,
            (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (a, b) => a + b).as("e"))
        .agg(avg("e")).head.getDouble(0)
    }
    val plain = mse(emb, "embedding", pq)
    val rotated = emb.withColumn("rot",
      ProductQuantization.rotateVec(col("embedding"), opq.rotation))
    val learned = mse(rotated, "rot", opq.pq)
    assert(learned <= plain * 1.02,
      s"OPQ reconstruction error $learned worse than plain PQ $plain")
  }

  test("opq reranked recall@5 is not worse than plain PQ at equal shortlist") {
    def recall(res: org.apache.spark.sql.DataFrame,
        exact: org.apache.spark.sql.DataFrame): Double =
      exact.join(res.groupBy("q_id").agg(collect_set(col("c_id")).as("ids")),
          Seq("q_id"), "left")
        .select((coalesce(size(array_intersect(col("ids"), col("exact_ids"))), lit(0))
          .cast("double") / 5).as("r"))
        .agg(avg("r")).head.getDouble(0)
    val queries = emb.filter(col("vec_id") < 8)
    val exact = graft.operators.Similarity
      .bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
      .groupBy("q_id").agg(collect_set(col("c_id")).as("exact_ids")).cache()
    val pq = ProductQuantization.fit(emb, "embedding", m = 8, k = 16)
    val plainR = recall(ProductQuantization.adcTopKReranked(queries,
      ProductQuantization.encode(emb, "vec_id", "embedding", pq),
      emb, "vec_id", "embedding", 5, 50, pq), exact)
    val opqR = recall(ProductQuantization.adcTopKRerankedOPQ(queries,
      ProductQuantization.encodeOPQ(emb, "vec_id", "embedding", opq),
      emb, "vec_id", "embedding", 5, 50, opq), exact)
    assert(opqR >= plainR - 0.05,
      s"OPQ recall $opqR fell below plain PQ recall $plainR")
    assert(opqR >= 0.5, s"OPQ reranked recall floor broken: $opqR")
  }

  test("scaledShortlist: floors at 4k, grows with n/1000, caps at 4096") {
    import ProductQuantization.scaledShortlist
    assert(scaledShortlist(10000L, 10) === 40)     // floor 4k wins
    assert(scaledShortlist(200000L, 10) === 200)   // n/1000 regime
    assert(scaledShortlist(100000000L, 10) === 4096) // cap
    assert(scaledShortlist(1000L, 50) === 200)     // floor scales with k
  }
}
