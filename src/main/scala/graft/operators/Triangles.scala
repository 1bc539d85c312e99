package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting via degree orientation (Suri &
  * Vassilvitskii, WWW'11 — "the curse of the last reducer"): orient
  * every undirected edge from its lower-(degree, id) endpoint to the
  * higher one, enumerate wedges at each node's OUT-neighbors only, and
  * close them against the edge set. The orientation bounds every
  * node's out-degree by O(√m), so the wedge self-join — the step that
  * detonates on a naive neighbor join when one hub node has a
  * million-edge adjacency — generates O(m^1.5) wedges total with no
  * skewed reducer, which is exactly the property that survives a
  * 100 TB power-law graph. Every triangle has exactly ONE apex (its
  * minimum node in the (degree, id) total order) with out-edges to
  * the other two, so each is counted once, no division by 3/6.
  *
  * Plan shape: two node-keyed equi-joins to attach degrees, one
  * self-equi-join on the wedge apex, one closing equi-join on the
  * normalized (min, max) pair key, and scalar-row aggregates — all
  * hash-partitionable; nothing driver-side.
  */
object Triangles {

  /** Input: distinct undirected edges with the first column < second
    * (by id). Output: one row (n_nodes, n_edges, n_triangles). */
  def count(edges: DataFrame): DataFrame = {
    val Array(cu, cv) = edges.columns.take(2)
    // the edge list feeds FOUR consumers (degrees, orientation, the
    // closing join, the edge count); without pinning, Spark re-derives
    // the caller's edge-construction subtree for each one — for q139's
    // co-purchase graph that meant 4× the per-order self-join+distinct
    // (measured 18.0 s → 6.9 s min-of-3 at sf0.1 from this one line)
    val e = edges.select(col(cu).as("u"), col(cv).as("v")).localCheckpoint()
    val deg = e.select(col("u").as("n")).union(e.select(col("v").as("n")))
      .groupBy("n").agg(org.apache.spark.sql.functions.count(lit(1)).as("deg"))
    val oriented = e
      .join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("u").as("s"), col("v").as("d")))
          .otherwise(struct(col("v").as("s"), col("u").as("d"))).as("o"))
      .select(col("o.s").as("s"), col("o.d").as("d"))
    // wedge pair normalized by plain id (x < y) so the closing join key
    // matches the input's (u < v) normalization regardless of which way
    // the degree order points the closing edge
    val wedges = oriented.as("o1").join(oriented.as("o2"),
        col("o1.s") === col("o2.s") && col("o1.d") < col("o2.d"))
      .select(col("o1.d").as("x"), col("o2.d").as("y"))
    val nTri = wedges
      .join(e.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n_triangles"))
    deg.agg(org.apache.spark.sql.functions.count(lit(1)).as("n_nodes"))
      .crossJoin(broadcast(e.agg(org.apache.spark.sql.functions.count(lit(1)).as("n_edges"))))
      .crossJoin(broadcast(nTri))
      .select("n_nodes", "n_edges", "n_triangles")
  }
}
