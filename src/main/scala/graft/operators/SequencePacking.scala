package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic parallel sequence packing: assign documents to
  * fixed-token-budget bins — the step that turns a curated corpus into
  * training sequences ("pack documents until ~budget tokens, start the
  * next sequence").
  *
  * Scale shape: packing is sequential by nature, so the parallel form
  * shards documents into `numGroups` independent packers by id hash and
  * runs a windowed cumulative sum WITHIN each group — one hash
  * exchange, every group packed concurrently, no global order
  * bottleneck (a single global packer would serialize 100 TB through
  * one range-partitioned window). Bin ids are (group, bin) pairs:
  * deterministic on every run and engine because the group assignment
  * and in-group order derive from the document id alone.
  *
  * A document larger than the budget still lands in one bin (real
  * packers then truncate or split it downstream); bins therefore fill
  * to AT LEAST the budget boundary they straddle.
  */
object SequencePacking {

  /** (id, nTok, pack_group, bin): greedy-by-id packing of `nTokCol`
    * tokens into `budget`-sized bins within `numGroups` parallel
    * groups. `bin` = budget multiples consumed in-group BEFORE this
    * document — i.e. a new bin starts once the previous one is full. */
  def pack(docs: DataFrame, idCol: String, nTokCol: String,
      numGroups: Int, budget: Int): DataFrame = {
    require(numGroups > 0 && budget > 0, "numGroups and budget must be positive")
    val w = Window.partitionBy("pack_group").orderBy(idCol)
    docs.select(col(idCol), col(nTokCol), (col(idCol) % numGroups).as("pack_group"))
      .withColumn("__cum", sum(col(nTokCol)).over(w))
      .select(col(idCol), col(nTokCol), col("pack_group"),
        floor((col("__cum") - col(nTokCol)).cast("double") / budget)
          .cast("long").as("bin"))
  }
}
