package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.GlobalIds
import graft.sources.Tables

/** Contiguous global numbering: equals the naive single-partition
  * window row_number, is a permutation of 1..N, is invariant to the
  * input's partitioning, and plans without any Window operator (the
  * point of the two-phase shape). */
class GlobalIdsSpec extends SparkSuite {

  private def docs = Tables(spark, sfDir, "documents")
    .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))

  test("equals the naive global-window row_number on the corpus") {
    val got = GlobalIds.assign(docs, "gid", numParts = 5,
      col("n_chars").desc, col("doc_id"))
    val naive = docs.withColumn("gid",
      row_number().over(Window.orderBy(col("n_chars").desc, col("doc_id"))).cast("long"))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("ids are a contiguous permutation 1..N") {
    val n = docs.count()
    val gids = GlobalIds.assign(docs, "gid", numParts = 7, col("doc_id"))
      .select("gid").collect().map(_.getLong(0)).sorted
    assert(gids.toSeq == (1L to n).toSeq)
  }

  test("invariant to input partitioning") {
    val a = GlobalIds.assign(docs, "gid", numParts = 4,
        col("n_chars").desc, col("doc_id"))
      .select("doc_id", "gid").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = GlobalIds.assign(docs.repartition(13), "gid", numParts = 9,
        col("n_chars").desc, col("doc_id"))
      .select("doc_id", "gid").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("plan has no Window operator and numbering runs over >1 partition") {
    val df = GlobalIds.assign(docs, "gid", numParts = 5, col("doc_id"))
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("Window"), s"window funnel in plan:\n$physical")
    assert(df.rdd.getNumPartitions > 1)
  }

  test("prefixSum equals the naive running-total window") {
    val got = GlobalIds.prefixSum(docs, "n_chars", "cum", numParts = 6, col("doc_id"))
    val naive = docs.withColumn("cum",
      sum(col("n_chars")).over(
        Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, 0)))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("prefixSum: last cumulative value is the grand total, invariant to partitioning") {
    val total = docs.agg(sum("n_chars")).head.getLong(0)
    val a = GlobalIds.prefixSum(docs, "n_chars", "cum", 4, col("doc_id"))
    val b = GlobalIds.prefixSum(docs.repartition(11), "n_chars", "cum", 9, col("doc_id"))
    assert(a.agg(max("cum")).head.getLong(0) == total)
    val am = a.select("doc_id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bm = b.select("doc_id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(am == bm)
  }

  // ---- prefixSumBy determinism (the q169 chain's only run-order-
  // sensitive machinery): identical output under ADVERSARIAL numbering
  // fan-outs × input layouts — range bounds are re-sampled per run, so
  // any boundary-dependence would show as a differing cum somewhere.
  private def grouped = docs
    .withColumn("bucket", expr("n_chars div 500"))

  test("prefixSumBy: identical output across numParts {1,7,32,200} × layouts") {
    val baseline = grouped.withColumn("cum",
      sum(col("n_chars")).over(
        Window.partitionBy("bucket").orderBy(col("n_chars"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select("doc_id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val layouts = Seq(
      ("pre-sorted", grouped.orderBy("bucket", "n_chars", "doc_id")),
      ("shuffled", grouped.orderBy(rand(17))),
      // adversarially skewed: everything funneled through ONE partition
      ("skewed", grouped.repartition(1)))
    for (parts <- Seq(1, 7, 32, 200); (name, in) <- layouts) {
      val got = GlobalIds.prefixSumBy(in, "bucket", "n_chars", "cum", parts,
          col("n_chars"), col("doc_id"))
        .select("doc_id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == baseline, s"prefixSumBy diverged at numParts=$parts layout=$name")
    }
  }

  test("prefixSumBy/prefixSum/prefixMax accept an INT value column (widened to LONG)") {
    // regression: the executor scan reads getLong on the materialized
    // row — an un-pinned INT input passed the driver phase then threw
    // ClassCastException in tasks
    val ints = docs.select(col("doc_id"), col("n_chars").cast("int").as("v"))
      .withColumn("bucket", expr("v div 500"))
    val bySum = GlobalIds.prefixSumBy(ints, "bucket", "v", "cum", 5, col("doc_id"))
    assert(bySum.schema("cum").dataType.typeName == "long" && bySum.count() > 0)
    val pSum = GlobalIds.prefixSum(ints, "v", "cum", 5, col("doc_id"))
    assert(pSum.agg(max("cum")).head.getLong(0) ==
      ints.agg(sum(col("v").cast("long"))).head.getLong(0))
    val pMax = GlobalIds.prefixMax(ints, "v", "pm", 5, col("doc_id"))
    assert(pMax.count() == ints.count())
  }
}
