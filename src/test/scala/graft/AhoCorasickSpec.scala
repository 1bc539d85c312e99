package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.operators.Blocklist
import graft.plans.AhoCorasick

/** Unit specs for the Aho–Corasick multi-pattern screen: automaton
  * semantics against a naive positional counter, the classic
  * overlapping-pattern fixture, codegen/interpreted equality, and the
  * Blocklist operator's column contract. (Cross-engine value parity is
  * the q186 DuckDB oracle gate.) */
class AhoCorasickSpec extends SparkSuite with TableDrivenPropertyChecks {
  import spark.implicits._

  /** All end positions of `p` in `s` (overlapping counted) — the
    * declared counting semantics, written independently. */
  private def naiveCount(s: String, p: String): Long =
    (0 to s.length - p.length).count(i => s.regionMatches(i, p, 0, p.length)).toLong

  private def acCounts(s: String, pats: Seq[String]): Seq[Long] = {
    val arr = new AhoCorasick(pats).countMatches(UTF8String.fromString(s))
    (0 until pats.size).map(arr.getLong)
  }

  test("automaton matches the naive positional counter on the classic he/she/his/hers fixture") {
    val pats = Seq("he", "she", "his", "hers")
    val s = "ushers say she heard his hers"
    assert(acCounts(s, pats) === pats.map(naiveCount(s, _)))
    // spot-check the overlap everyone gets wrong: "ushers" contains
    // she AND he AND hers
    assert(acCounts("ushers", pats) === Seq(1L, 1L, 0L, 1L))
  }

  test("self-overlapping pattern counts every end position") {
    assert(acCounts("aaaa", Seq("aa")) === Seq(3L))
    assert(acCounts("a a a", Seq("a a")) === Seq(2L))
  }

  test("property: AC == naive counting over random small-alphabet strings and pattern sets") {
    val rnd = new scala.util.Random(42)
    val pats = Seq("a", "ab", "ba", "aab", "abab", "bb", "aaa")
    (1 to 200).foreach { _ =>
      val s = (1 to rnd.nextInt(60)).map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString
      assert(acCounts(s, pats) === pats.map(naiveCount(s, _)), s"input: '$s'")
    }
  }

  test("ASCII patterns never false-match inside multi-byte UTF-8 sequences") {
    // é is 0xC3 0xA9; pattern bytes are all < 0x80 so no byte of a
    // multi-byte char can start or continue a match
    assert(acCounts("café caffé", Seq("caf", "fe")) === Seq(2L, 0L))
    assert(acCounts("日本語 spark 日本語", Seq("spark")) === Seq(1L))
  }

  test("constructor rejects empty lists, empty patterns, duplicates, and oversized sets") {
    intercept[IllegalArgumentException](new AhoCorasick(Nil))
    intercept[IllegalArgumentException](new AhoCorasick(Seq("a", "")))
    intercept[IllegalArgumentException](new AhoCorasick(Seq("a", "a")))
    intercept[IllegalArgumentException](new AhoCorasick(Seq("x" * 100_001)))
  }

  test("GENERATED code compiles and equals interpreted eval (incl. null)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.StringType
    val pats = Seq("he", "she", "hers", "a a")
    val expr = graft.plans.AhoCorasickExpr.MultiPatternCountsExpr(
      BoundReference(0, StringType, nullable = true), pats)
    // generate() compiles eagerly — a janino failure (the silent
    // CodegenFallback trap) fails the test instead of degrading
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    Seq("ushers say she", "a a a", "", "café").foreach { s =>
      val row = InternalRow(UTF8String.fromString(s))
      val gen = proj(row).getArray(0)
      val interp = expr.eval(row)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      assert((0 until gen.numElements()).map(gen.getLong) ===
        (0 until interp.numElements()).map(interp.getLong), s"input: '$s'")
    }
    assert(proj(InternalRow(null)).isNullAt(0))
    // end-to-end through the DataFrame path too
    val docs = Seq((1L, "ushers say she"), (2L, "a a a"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text").repartition(3)
    val r = docs.select(col("doc_id"),
        graft.plans.AhoCorasickExpr.multiPatternCounts(col("text"), pats).as("hits"))
      .orderBy("doc_id").collect()
    // "he" is inside BOTH "ushers" and the standalone "she"
    assert(r(0).getAs[Seq[Long]]("hits") === Seq(2L, 2L, 1L, 0L))
    assert(r(1).getAs[Seq[Long]]("hits") === Seq(0L, 0L, 0L, 2L))
    assert(r(2).isNullAt(1))
  }

  test("Blocklist.screen: totals, distinct-hit count, and the null-text verdict") {
    val docs = Seq((1L, "sort merge sort merge"), (2L, "hash only"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val r = Blocklist.screen(docs, "doc_id", "text", Seq("sort merge", "merge", "zz"))
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("total_hits") === 4L) // 2 + 2 + 0
    assert(r(0).getAs[Int]("n_patterns_hit") === 2)
    assert(r(0).getAs[Boolean]("flagged"))
    assert(!r(1).getAs[Boolean]("flagged"))
    assert(r(2).isNullAt(r(2).fieldIndex("total_hits")))
    assert(!r(2).getAs[Boolean]("flagged"))
  }

  test("Blocklist.summary: per-pattern doc/occurrence totals, zero-hit patterns retained") {
    val docs = Seq((1L, "spark spark"), (2L, "spar"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val r = Blocklist.summary(docs, "doc_id", "text", Seq("spark", "par", "zz"))
      .orderBy("pattern").collect()
    val byPat = r.map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(byPat("spark") === (1L, 2L))
    assert(byPat("par") === (2L, 3L)) // both docs; 2 in doc 1, 1 in doc 2
    assert(byPat("zz") === (0L, 0L))
  }
}
