package graft

import org.apache.spark.sql.functions._

import graft.operators.CountMin
import graft.operators.CountMin.{CMState, CountMinAgg}

/** Count–Min sketch: the one-sided guarantee under forced collisions,
  * exact mergeability (the property that makes it a distributed
  * aggregate), and the min-rule's advantage over any single row.
  */
class CountMinSpec extends SparkSuite {

  private def exactCounts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("est >= exact for every key, even with w far below the key count") {
    import spark.implicits._
    // 500 distinct keys into w=16 slots: heavy collisions guaranteed
    val xs = (0 until 5000).map(i => s"key${i % 500}")
    val sk = spark.createDataset(xs).select(new CountMinAgg(4, 16).toColumn).head()
    val exact = exactCounts(xs)
    assert(sk.total == xs.size)
    exact.foreach { case (k, n) =>
      assert(CountMin.estimate(sk, k) >= n, s"underestimate for $k")
    }
  }

  test("merge of partial sketches equals the sketch of the whole stream") {
    import spark.implicits._
    val xs = (0 until 3000).map(i => s"tok${(i * 7919) % 200}")
    val agg = new CountMinAgg(5, 64)
    val whole = spark.createDataset(xs).select(agg.toColumn).head()
    val left = spark.createDataset(xs.take(1000)).select(agg.toColumn).head()
    val right = spark.createDataset(xs.drop(1000)).select(agg.toColumn).head()
    val merged = agg.merge(left, right)
    assert(merged.total == whole.total)
    assert(merged.counts.toSeq == whole.counts.toSeq)
  }

  test("the d-row min rule is never looser than any single row") {
    import spark.implicits._
    val xs = (0 until 2000).map(i => s"v${i % 300}")
    val sk = spark.createDataset(xs).select(new CountMinAgg(5, 32).toColumn).head()
    exactCounts(xs).keys.foreach { k =>
      val perRow = (0 until sk.d).map(i =>
        sk.counts(i * sk.w + CountMin.slot(k, i, sk.w)))
      assert(CountMin.estimate(sk, k) == perRow.min)
    }
  }

  test("sketchTokens over documents matches exact counts when w clears the vocab") {
    // the test corpus vocabulary is tiny; with no collisions CM is exact
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    val sk = CountMin.sketchTokens(docs, "text", 3, 4096)
    val exact = docs
      .select(explode(graft.functions.TextFunctions.normalizedWords(col("text"))).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(exact.nonEmpty)
    // distinct vocab must actually be << w for this exactness check
    assert(exact.length < 500, s"vocab ${exact.length} too big for the premise")
    exact.foreach { case (word, n) =>
      assert(CountMin.estimate(sk, word) == n, s"$word")
    }
    assert(sk.total == exact.map(_._2).sum)
  }
}
