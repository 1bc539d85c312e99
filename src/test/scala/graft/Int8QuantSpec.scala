package graft

import org.apache.spark.sql.functions._

import graft.operators.{Int8Quant, Similarity}
import graft.plans.VectorExprs
import graft.sources.Tables

class Int8QuantSpec extends SparkSuite {
  import spark.implicits._

  private def emb = Tables(spark, sfDir, "embeddings")

  test("dot_i8 native expr equals a composed zip_with/aggregate reference") {
    // Seq[Byte], not Array[Byte]: the encoder maps Array[Byte] to
    // BINARY, while the codes column is ARRAY<TINYINT>
    val df = Seq(
      (Seq[Byte](1, -2, 3), Seq[Byte](4, 5, -6)),
      (Seq[Byte](127, -127, 0), Seq[Byte](127, 127, 9)),
      (Seq[Byte](), Seq[Byte]())
    ).toDF("a", "b")
    val composed = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, x) => acc + x)
    val rows = df.select(VectorExprs.dotI8(col("a"), col("b")).as("native"),
      composed.as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    assert(rows(0).getLong(0) === (4 - 10 - 18))
  }

  test("dot_i8: length mismatch and null element yield null; type check rejects floats") {
    val df = Seq((Seq[Byte](1, 2), Seq[Byte](1, 2, 3))).toDF("a", "b")
    assert(df.select(VectorExprs.dotI8(col("a"), col("b"))).head.isNullAt(0))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      emb.select(VectorExprs.dotI8(col("embedding"), col("embedding"))).head
    }
    assert(e.getMessage.contains("dot_i8"))
  }

  test("encode: codes are clamped to [-127,127] and scale reconstructs within half a step") {
    val scale = Int8Quant.fit(emb, "embedding")
    assert(scale > 0)
    val enc = Int8Quant.encode(emb, "vec_id", "embedding", scale)
    val mx = enc.select(max(array_max(transform(col("codes"), c => abs(c.cast("int")))))).head.getInt(0)
    assert(mx <= 127)
    // per-element reconstruction error ≤ scale/254 (half a quantization
    // step) — checked against the original floats for a sample
    val err = enc.join(emb, col("id") === col("vec_id"))
      .select(max(array_max(zip_with(col("codes"), col("embedding"),
        (c, x) => abs(c.cast("double") * scale / 127.0 - x.cast("double"))))))
      .head.getDouble(0)
    assert(err <= scale / 254.0 + 1e-12, s"max reconstruction error $err vs step ${scale / 254.0}")
  }

  test("int8 top-k recall@5 vs exact is ≥ 0.9 and the plan broadcasts the query side") {
    val k = 5
    val scale = Int8Quant.fit(emb, "embedding")
    val encoded = Int8Quant.encode(emb, "vec_id", "embedding", scale)
    val qs = emb.filter(col("vec_id") < 10)
    val i8 = Int8Quant.topK(qs, encoded, "vec_id", "embedding", k, scale)
    assert(i8.queryExecution.executedPlan.toString.contains("Broadcast"))
    val exact = Similarity.bruteForceTopK(qs, emb, "vec_id", "embedding", k)
    val e = exact.groupBy("q_id").agg(collect_set(col("c_id")).as("e")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val g = i8.groupBy("q_id").agg(collect_set(col("c_id")).as("g")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val recalls = e.map { case (q, ids) =>
      ids.intersect(g.getOrElse(q, Set.empty)).size.toDouble / k }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@5 $mean")
  }

  test("IVF+int8: full-probe degenerates to the plain int8 top-k; partial probe clears the floor") {
    val k = 5
    val qs = emb.filter(col("vec_id") < 10)
    val scale = Int8Quant.fit(emb, "embedding")
    val nCent = 8
    // probing every list = un-pruned int8 scan: identical scores and
    // tie-breaks, so row-identical results
    val full = Int8Quant.ivfTopK(qs, emb, "vec_id", "embedding", k,
        nProbe = nCent, nCentroids = nCent, scale = scale)
      .select("q_id", "c_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val plain = Int8Quant.topK(qs, Int8Quant.encode(emb, "vec_id", "embedding", scale),
        "vec_id", "embedding", k, scale)
      .select("q_id", "c_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(full === plain)
    // partial probe still clears the declared gate's floor
    val part = Int8Quant.ivfTopK(qs, emb, "vec_id", "embedding", k,
      nProbe = 4, nCentroids = 16, scale = scale)
    val exact = Similarity.bruteForceTopK(qs, emb, "vec_id", "embedding", k)
      .groupBy("q_id").agg(collect_set(col("c_id")).as("e"))
    val rec = exact.join(part.groupBy("q_id").agg(collect_set(col("c_id")).as("g")),
        Seq("q_id"), "left")
      .select((coalesce(size(array_intersect(col("g"), col("e"))), lit(0))
        .cast("double") / k).as("r"))
      .agg(avg("r")).head.getDouble(0)
    assert(rec >= 0.4, s"IVF+int8 recall $rec below gate floor")
  }

  test("q90 declared query self-gates: recall_ok true on the gate corpus") {
    val df = graft.SparkEntry.queries("q90_int8_ann")(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("recall_ok")))
  }
}
