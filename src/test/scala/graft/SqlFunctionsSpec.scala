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

  test("non-literal sketch parameter raises a clear error") {
    GraftFunctions.register(spark)
    Tables.registerAll(spark, sfDir)
    val e = intercept[Exception] {
      spark.sql("SELECT simhash(array(text), length(text)) FROM documents").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
