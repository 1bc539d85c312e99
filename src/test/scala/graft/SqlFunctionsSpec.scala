package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}
import graft.plans.GraftFunctions
import graft.sources.Tables

/** The SQL registration path produces the same results as the Column
  * API for every native expression. */
class SqlFunctionsSpec extends SparkSuite {

  test("SQL rolling_fingerprint/minhash_signature/simhash == Column API") {
    GraftFunctions.register(spark)
    Tables.registerAll(spark, sfDir)

    val sqlFp = spark.sql(
      """SELECT doc_id, rolling_fingerprint(lower(text), 8, 4)[0] AS fp_min FROM documents""")
    val apiFp = TextAnalysis.fingerprint(Tables(spark, sfDir, "documents"), "doc_id", "text")
      .select("doc_id", "fp_min")
    assert(sqlFp.exceptAll(apiFp).isEmpty && apiFp.exceptAll(sqlFp).isEmpty)

    val sqlSim = spark.sql(
      """SELECT doc_id, simhash(filter(transform(split(text, '\\s+'),
        |  x -> regexp_replace(lower(x), '[^a-z]', '')), x -> x <> ''), 16) AS sig
        |FROM documents""".stripMargin)
    val apiSim = Dedup.simhashSignature(Tables(spark, sfDir, "documents"), "doc_id", "text", 16)
    assert(sqlSim.exceptAll(apiSim).isEmpty && apiSim.exceptAll(sqlSim).isEmpty)

    val sqlMh = spark.sql(
      """SELECT minhash_signature(array_distinct(filter(transform(split(text, '\\s+'),
        |  x -> regexp_replace(lower(x), '[^a-z]', '')), x -> x <> '')), 12)[0] AS h0
        |FROM documents""".stripMargin)
    val apiMh = Dedup.minhashSignatures(
      Tables(spark, sfDir, "documents"), "doc_id", "text", n = 1, k = 12).select("h0")
    assert(sqlMh.exceptAll(apiMh).isEmpty && apiMh.exceptAll(sqlMh).isEmpty)
  }

  test("SQL dot_d/dot_i8/hyperplane_bucket/jl_project == Column API") {
    GraftFunctions.register(spark)
    Tables.registerAll(spark, sfDir)
    val emb = Tables(spark, sfDir, "embeddings")

    val sqlDot = spark.sql(
      "SELECT dot_d(embedding, embedding) AS d FROM embeddings")
    val apiDot = emb.select(
      graft.functions.VectorFunctions.dot(col("embedding"), col("embedding")).as("d"))
    assert(sqlDot.exceptAll(apiDot).isEmpty && apiDot.exceptAll(sqlDot).isEmpty)

    val sqlI8 = spark.sql(
      """SELECT dot_i8(transform(embedding, x -> CAST(CAST(x * 10 AS INT) AS TINYINT)),
        |              transform(embedding, x -> CAST(CAST(x * 10 AS INT) AS TINYINT))) AS d
        |FROM embeddings""".stripMargin)
    val codes = transform(col("embedding"),
      x => (x * 10).cast("int").cast("byte"))
    val apiI8 = emb.select(
      graft.plans.VectorExprs.dotI8(codes, codes).as("d"))
    assert(sqlI8.exceptAll(apiI8).isEmpty && apiI8.exceptAll(sqlI8).isEmpty)

    val sqlHp = spark.sql("SELECT hyperplane_bucket(embedding, 6) AS b FROM embeddings")
    val apiHp = emb.select(
      graft.functions.VectorFunctions.hyperplaneBucket(col("embedding"), 6).as("b"))
    assert(sqlHp.exceptAll(apiHp).isEmpty && apiHp.exceptAll(sqlHp).isEmpty)

    val sqlJl = spark.sql("SELECT jl_project(embedding, 8) AS jl FROM embeddings")
    val apiJl = emb.select(
      graft.functions.VectorFunctions.jlProject(col("embedding"), 8).as("jl"))
    assert(sqlJl.exceptAll(apiJl).isEmpty && apiJl.exceptAll(sqlJl).isEmpty)
  }

  test("ngrams_tf generator == the composed posexplode(wordShingles) rows; null/short contracts") {
    GraftFunctions.register(spark)
    Tables.registerAll(spark, sfDir)
    val viaGen = spark.sql(
      "SELECT doc_id, g.pos, g.gram FROM documents " +
      "LATERAL VIEW ngrams_tf(text, 2) g AS pos, gram")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val composed = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), posexplode(graft.functions.TextFunctions.wordShingles(
        graft.functions.TextFunctions.normalizedWords(col("text")), 2))
        .as(Seq("pos0", "gram")))
      .select(col("doc_id"), (col("pos0") + 1).cast("int").as("pos"), col("gram"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(viaGen.nonEmpty && viaGen === composed)
    // null text and sub-n docs generate zero rows, like explode(null)
    import spark.implicits._
    val edge = Seq((1L, null: String), (2L, "one")).toDF("doc_id", "text")
    edge.createOrReplaceTempView("edge_docs")
    assert(spark.sql(
      "SELECT doc_id, g.gram FROM edge_docs LATERAL VIEW ngrams_tf(text, 2) g AS pos, gram")
      .count() === 0)
    // type check: non-string input fails at analysis, not at runtime
    intercept[Exception] {
      spark.sql("SELECT ngrams_tf(doc_id, 2) FROM edge_docs").collect()
    }
  }

  test("non-literal sketch parameter raises a clear error") {
    GraftFunctions.register(spark)
    Tables.registerAll(spark, sfDir)
    val e = intercept[Exception] {
      spark.sql("SELECT simhash(array(text), length(text)) FROM documents").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
