package graft
import org.apache.spark.sql.functions._
class Q45CheckSpec extends SparkSuite {
  test("q45 gates hold at sf0.001") {
    val df = SparkEntry.queries("q45_ann_ivf_kmeans")(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("ivf_eq_fixed")), "twin must agree bit-for-bit")
    println("Q45OK recall_ok=" + rows.head.getAs[Boolean]("recall_ok") +
      " mean=" + rows.head.getAs[Double]("mean_recall"))
  }
}
