package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorFunctions}

/** k-center greedy coreset selection (Gonzalez '85; the diversity-
  * maximizing data-selection shape of Sener & Savarese ICLR'18): pick
  * the point farthest from the already-selected set, k times. The
  * selected set 2-approximates the optimal k-center cover, which is
  * why active-learning and data-pruning recipes use it to carve a
  * small, maximally-spread subset out of an embedding corpus — the
  * diversity complement of [[Dsir]]'s distribution matching and
  * [[Similarity]]'s nearest-neighbor retrieval.
  *
  * Algorithm state is one DOUBLE column: `mind` = each point's
  * distance (1 − cosine, 4-dp floor-rounded — the engine-exact
  * ranking idiom) to the nearest selected center. Each round:
  * (1) argmax of `mind` with an id tie-break — ONE TakeOrdered(1)
  * scalar to the driver; (2) fold the new center into `mind` — ONE
  * narrow map against the center vector as a broadcast literal.
  * The sequential data dependency is the algorithm's own (round r's
  * selection depends on r−1), so k passes is optimal, not an
  * implementation artifact.
  *
  * 100 TB shape: per round, zero shuffles — a narrow projection plus
  * a per-partition bounded-heap argmax; driver traffic is k vectors
  * total. The growing `least(...)` projection chain is truncated by
  * localCheckpoint every `checkpointEvery` rounds (the q63/q101
  * lineage idiom); at cluster scale the (id, vec, mind) relation
  * would be persisted once and updated per round the same way.
  *
  * Determinism contract: distances are floor-rounded to 4 dp before
  * both the min-fold and the argmax (ties broken by smallest id), so
  * a DuckDB oracle replays the full k-round trajectory bit-for-bit.
  * Degenerate corpora (fewer distinct directions than k) re-pick by
  * the same deterministic rule on both engines.
  */
object Coreset {

  /** 4-dp-rounded cosine distance from the `v` column to a constant
    * center vector. */
  private def distTo(center: Seq[Float]): Column =
    TextFunctions.round4(
      lit(1.0) - VectorFunctions.cosine(col("v"), typedlit(center)))

  /** The k selected centers as (step, vec_id, d): step 1 is the
    * deterministic seed (smallest id, d = NULL); step r ≥ 2 records
    * the selection's distance to the set at pick time. */
  def kCenterGreedy(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      checkpointEvery: Int = 8): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val spark = emb.sparkSession
    import spark.implicits._
    val base = emb.select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("v"))
    val seed = base.orderBy("vec_id").limit(1).head
    val seedId = seed.getLong(0)
    var picked = List[(Int, Long, Option[Double])]((1, seedId, None))
    var cur = base.withColumn("mind", distTo(seed.getSeq[Float](1)))
    for (r <- 2 to k) {
      val sel = cur.orderBy(col("mind").desc, col("vec_id")).limit(1).head
      picked ::= ((r, sel.getLong(0), Some(sel.getDouble(2))))
      if (r < k) {
        cur = cur.withColumn("mind",
          least(col("mind"), distTo(sel.getSeq[Float](1))))
        if (r % checkpointEvery == 0) cur = cur.localCheckpoint()
      }
    }
    picked.reverse.toDF("step", "vec_id", "d")
  }
}
