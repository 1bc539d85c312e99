package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.api.MapReduce
import graft.functions.TextFunctions
import graft.sources.Tables

object MapReduceApiSpec {
  case class Stats(n: Long, sum: Double)

  val avgAgg: Aggregator[(String, Double), Stats, Double] =
    new Aggregator[(String, Double), Stats, Double] {
      def zero = Stats(0L, 0.0)
      def reduce(b: Stats, a: (String, Double)) = Stats(b.n + 1, b.sum + a._2)
      def merge(a: Stats, b: Stats) = Stats(a.n + b.n, a.sum + b.sum)
      def finish(b: Stats) = if (b.n == 0) 0.0 else b.sum / b.n
      def bufferEncoder = Encoders.product[Stats]
      def outputEncoder = Encoders.scalaDouble
    }
}

class MapReduceApiSpec extends SparkSuite {

  test("wordCount over documents == q26 term frequencies") {
    import spark.implicits._
    val docs = Tables(spark, sfDir, "documents")
    val normalized = docs.select(
      concat_ws(" ", TextFunctions.normalizedWords(col("text"))).as("t")).as[String]
    val mr = MapReduce.wordCount(normalized).toDF("word", "cnt")
    val sqlish = docs
      .select(explode(TextFunctions.normalizedWords(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    assert(mr.exceptAll(sqlish).isEmpty && sqlish.exceptAll(mr).isEmpty)
  }

  test("reduceByKey builds the inverted index (set-union reducer) == q01 pairs") {
    import spark.implicits._
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
      .as[(Long, String)]
    val mr = MapReduce.reduceByKey(docs) { case (id, text) =>
      text.toLowerCase.split("\\s+").iterator
        .map(_.replaceAll("[^a-z]", "")).filter(_.nonEmpty).distinct
        .map(w => w -> Set(id))
    }(_ ++ _)
      .map { case (w, ids) => (w, ids.toSeq.sorted.mkString(" ")) }
      .toDF("word", "ids")
    val df = SparkEntry.queries("q01_inverted_index")(spark, sfDir)
      .select(regexp_extract(col("line"), "^([a-z]+):\\[(.*)\\]$", 1).as("word"),
        regexp_extract(col("line"), "^([a-z]+):\\[(.*)\\]$", 2).as("ids"))
    assert(mr.exceptAll(df).isEmpty && df.exceptAll(mr).isEmpty)
  }

  test("aggregateByKey with a typed Aggregator: per-flag quantity stats") {
    import spark.implicits._
    import MapReduceApiSpec.avgAgg
    val li = Tables(spark, sfDir, "lineitem")
      .select("l_returnflag", "l_quantity").as[(String, Double)]
    val mr = MapReduce.aggregateByKey(li)(r => Iterator.single(r))(avgAgg)
      .toDF("flag", "avg_qty")
      .withColumn("avg_qty", round(col("avg_qty"), 6))
    val sqlish = Tables(spark, sfDir, "lineitem").groupBy(col("l_returnflag").as("flag"))
      .agg(round(avg("l_quantity"), 6).as("avg_qty"))
    assert(mr.exceptAll(sqlish).isEmpty && sqlish.exceptAll(mr).isEmpty)
  }
}
