package graft

import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoin
import graft.sources.Tables

/** Deletion-neighborhood edit-distance-1 join: blocking completeness on
  * the hand cases (substitution / insertion / deletion / the "ab","ba"
  * distance-2 false positive the refine must kill), equality with the
  * naive theta join on real data, and the hot-bucket cap. */
class FuzzyJoinSpec extends SparkSuite {

  test("deletion variants of 'abc' = {abc, bc, ac, ab}") {
    import spark.implicits._
    val got = Seq("abc").toDF("s")
      .select(FuzzyJoin.deletionVariants(col("s")).as("v"))
      .head.getSeq[String](0).toSet
    assert(got == Set("abc", "bc", "ac", "ab"))
  }

  test("hand cases: sub/ins/del matched, distance-2 anagram rejected") {
    import spark.implicits._
    val df = Seq(
      1L -> "kitten", 2L -> "mitten",  // substitution
      3L -> "cat", 4L -> "cart",       // insertion
      5L -> "ab", 6L -> "ba",          // distance 2, shares variants "a" and "b"
      7L -> "xyz"                      // isolated
    ).toDF("id", "s")
    val pairs = FuzzyJoin.edit1Pairs(df, "id", "s")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (3L, 4L)))
  }

  test("equals the naive theta join on customer names") {
    val cust = Tables(spark, sfDir, "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("s"))
    val got = FuzzyJoin.edit1Pairs(cust, "id", "s")
      .select("id_a", "id_b")
    val a = cust.select(col("id").as("id_a"), col("s").as("sa"))
    val b = cust.select(col("id").as("id_b"), col("s").as("sb"))
    val naive = a.crossJoin(b)
      .filter(col("id_a") < col("id_b") && levenshtein(col("sa"), col("sb")) <= 1)
      .select("id_a", "id_b")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
    assert(got.count() > 0, "fixture corpus should contain edit-1 name pairs")
  }

  test("maxVariantDf strips hot buckets and only ever removes pairs") {
    import spark.implicits._
    // ten strings sharing the hot variant "aa" (delete one char of "aaa"... )
    val df = ((1L to 10L).map(_ -> "aaa") ++ Seq(11L -> "kitten", 12L -> "mitten"))
      .toDF("id", "s")
    val uncapped = FuzzyJoin.edit1Pairs(df, "id", "s")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = FuzzyJoin.edit1Pairs(df, "id", "s", maxVariantDf = Some(5))
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(uncapped))
    assert(uncapped.contains((1L, 2L)), "identical strings are edit-0 pairs")
    assert(!capped.exists { case (x, y) => x <= 10 && y <= 10 },
      "the saturated 'aaa' clique must be stripped by the cap")
    assert(capped.contains((11L, 12L)), "cold pairs survive the cap")
  }
}
