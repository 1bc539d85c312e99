package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS — hubs and authorities (Kleinberg 1999, "Authoritative sources
  * in a hyperlinked environment", JACM 46(5)) over a weighted edge
  * relation: the link-analysis companion to [[PageRank]] the crawl
  * family uses for SEED SCORING — a good hub points at many good
  * authorities, a good authority is pointed at by many good hubs. On
  * an anchor graph (q212's edges) the authority score ranks landing
  * pages by weighted hub endorsement — a different (and for seed
  * lists, often better) signal than raw indegree, because a hub's
  * endorsement is worth what the hub itself is worth.
  *
  * Exact-integer discipline (the [[PageRank]]/q91 idiom, adapted):
  * Kleinberg's L2 normalization is irrational, so each half-round
  * instead rescales by the MAXIMUM raw score —
  *
  *   rawA(v) = Σ_{u→v} h(u)·w(u,v);   a(v) = (rawA(v)·scale) div max rawA
  *   rawH(u) = Σ_{u→v} a(v)·w(u,v);   h(u) = (rawH(u)·scale) div max rawH
  *
  * — max-normalization (the other standard HITS normalization; see
  * Langville & Meyer 2005, "A survey of eigenvector methods for web
  * information retrieval", §4: any fixed rescaling yields the same
  * ranking fixpoint). Every quantity is integer, every division a
  * floor against a deterministic scalar, so sums are order-independent
  * and DuckDB replays the scores bit-for-bit through unrolled rounds.
  * The top node per half-round sits at exactly `scale`.
  *
  * Overflow bound, stated: scores ≤ scale (1e6) and rawA ≤
  * scale·(total incident weight), so the rescale product
  * rawA·scale < 2^63 needs total graph weight below ~9.2e6 — the
  * per-host anchor graphs this serves are far inside it; shard or
  * lower `scale` past that.
  *
  * 100 TB shape: per half-round one hash join of the (persisted,
  * materialized-once) edge set against the bounded one-row-per-node
  * score frame + one combine-able aggregation — shuffles on node id
  * only, exactly a Pregel superstep's lowering; the max is a scalar
  * (one tiny driver value per half-round, like PageRank's dangling
  * mass). Lineage truncates per round (lazy localCheckpoint), and the
  * edge blocks are released once the result materializes (the
  * [[Communities]] retention discipline).
  */
object Hits {

  val scale = 1000000L // 1e6 fixed-point units; top hub/authority = scale

  /** Hub/authority scores after `iterations` full rounds over
    * `edges(src, dst, w)` (w a positive integral weight). Returns
    * (node, hub_units, auth_units) for every node; a node with no
    * out-edges has hub 0, with no in-edges authority 0. */
  def run(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, s"hits: iterations must be >= 1, got $iterations")
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    require(nodes.count() > 0, "hits: empty graph") // also materializes e once
    var hubs = nodes.withColumn("h", lit(scale))
    var auths = nodes.withColumn("a", lit(0L))
    for (_ <- 1 to iterations) {
      val rawA = e.join(hubs.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("h") * col("w")).as("r"))
        .groupBy("node").agg(sum("r").as("raw"))
      // deterministic scalar per half-round (the dangling-mass shape)
      val maxA = rawA.agg(coalesce(max("raw"), lit(1L))).head.getLong(0) max 1L
      auths = nodes
        .join(rawA, Seq("node"), "left_outer")
        .select(col("node"),
          coalesce(expr(s"(raw * ${scale}L) div ${maxA}L"), lit(0L)).as("a"))
        .localCheckpoint(false)
      val rawH = e.join(auths.withColumnRenamed("node", "dst"), "dst")
        .select(col("src").as("node"), (col("a") * col("w")).as("r"))
        .groupBy("node").agg(sum("r").as("raw"))
      val maxH = rawH.agg(coalesce(max("raw"), lit(1L))).head.getLong(0) max 1L
      hubs = nodes
        .join(rawH, Seq("node"), "left_outer")
        .select(col("node"),
          coalesce(expr(s"(raw * ${scale}L) div ${maxH}L"), lit(0L)).as("h"))
        .localCheckpoint(false)
    }
    val out = nodes
      .join(hubs.withColumnRenamed("h", "hub_units"), Seq("node"), "left_outer")
      .join(auths.withColumnRenamed("a", "auth_units"), Seq("node"), "left_outer")
      .select(col("node"),
        coalesce(col("hub_units"), lit(0L)).as("hub_units"),
        coalesce(col("auth_units"), lit(0L)).as("auth_units"))
      .localCheckpoint()
    e.unpersist()
    nodes.unpersist()
    out
  }

  /** Driver-side double-precision replay with max-normalization — the
    * spec's independent witness (same structure, no integer floors). */
  def runReference(edges: Seq[(String, String, Long)],
      iterations: Int): Map[String, (Double, Double)] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var h = nodes.map(_ -> 1.0).toMap
    var a = nodes.map(_ -> 0.0).toMap
    for (_ <- 1 to iterations) {
      val rawA = edges.groupBy(_._2).view
        .mapValues(_.map { case (s, _, w) => h(s) * w }.sum).toMap
      val mA = if (rawA.isEmpty) 1.0 else rawA.values.max max 1e-300
      a = nodes.map(n => n -> (rawA.getOrElse(n, 0.0) / mA)).toMap
      val rawH = edges.groupBy(_._1).view
        .mapValues(_.map { case (_, d, w) => a(d) * w }.sum).toMap
      val mH = if (rawH.isEmpty) 1.0 else rawH.values.max max 1e-300
      h = nodes.map(n => n -> (rawH.getOrElse(n, 0.0) / mH)).toMap
    }
    nodes.map(n => n -> ((h(n), a(n)))).toMap
  }
}
