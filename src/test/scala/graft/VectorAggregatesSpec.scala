package graft

import org.apache.spark.sql.functions._

import graft.operators.VectorAggregates
import graft.sources.Tables

/** Mergeable vector-sum aggregator: equals the posexplode reference,
  * exact under repartitioning, null rows ignored. */
class VectorAggregatesSpec extends SparkSuite {

  private def emb = Tables(spark, sfDir, "embeddings")

  test("equals the posexplode reference sums") {
    val got = emb.groupBy("label")
      .agg(VectorAggregates.vectorSumUnits(col("embedding"), 64).as("su"))
      .select(col("label"), col("su"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val ref = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(sum(floor(col("v").cast("double") * 1000000 + 0.5).cast("long")).as("s"))
      .groupBy("label")
      .agg(sort_array(collect_list(struct(col("pos"), col("s")))).as("ps"))
      .collect().map(r => r.getInt(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1))).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (l, s) => assert(s == ref(l), s"label $l") }
  }

  test("bit-identical under repartitioning (integer units, not float sums)") {
    def run(df: org.apache.spark.sql.DataFrame) = df.groupBy("label")
      .agg(VectorAggregates.vectorSumUnits(col("embedding"), 64).as("su"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(run(emb) == run(emb.repartition(17)))
  }

  test("null embeddings are ignored") {
    import spark.implicits._
    val df = Seq(
      (1, Some(Seq(1.0f, 2.0f))),
      (1, Option.empty[Seq[Float]]),
      (1, Some(Seq(0.5f, -0.25f)))).toDF("label", "embedding")
    val su = df.groupBy("label")
      .agg(VectorAggregates.vectorSumUnits(col("embedding"), 2).as("su"))
      .head.getSeq[Long](1)
    assert(su == Seq(1500000L, 1750000L))
  }
}
