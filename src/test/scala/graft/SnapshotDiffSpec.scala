package graft

import graft.operators.SnapshotDiff

/** Snapshot diff: all four statuses, null-content handling, and the
  * multi-column separator (no concatenation ambiguity). */
class SnapshotDiffSpec extends SparkSuite {
  import spark.implicits._

  test("added / removed / changed / unchanged, including null content") {
    val oldDf = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, Some("c")), (4L, Option.empty[String]))
      .toDF("id", "v")
    val newDf = Seq(
      (1L, Some("a")),            // unchanged
      (2L, Some("B")),            // changed
      (4L, Option.empty[String]), // unchanged (null == null)
      (5L, Some("e")))            // added; 3 removed
      .toDF("id", "v")
    val got = SnapshotDiff.diff(oldDf, newDf, "id", Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added"))
  }

  test("multi-column content is separator-delimited: (ab, c) != (a, bc)") {
    val oldDf = Seq((1L, "ab", "c")).toDF("id", "x", "y")
    val newDf = Seq((1L, "a", "bc")).toDF("id", "x", "y")
    val got = SnapshotDiff.diff(oldDf, newDf, "id", Seq("x", "y"))
      .collect().map(r => r.getString(1))
    assert(got.toSeq == Seq("changed"))
  }
}
