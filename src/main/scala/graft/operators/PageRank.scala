package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank (Page et al., 1999) over an edge relation — the
  * iterative graph-analytics shape (domain authority for crawl
  * prioritization, source weighting for mixture design) that
  * complements [[Dedup]]'s connected components.
  *
  * Every quantity is EXACT-INTEGER (the q91 idiom): ranks live in
  * `scale` fixed-point units and every per-edge contribution is
  * floor-divided BEFORE the aggregation, so sums are integer —
  * order-independent, repartition-invariant, and bit-identical in any
  * engine. The damping factor is the exact rational dampNum/dampDen
  * (default 17/20 = 0.85). The tiny mass the floors shave off is
  * deterministic; PageRankSpec pins the fixed-point ranks against a
  * driver-side double-precision replay to within quantization error.
  *
  * One iteration, all relational:
  *   contrib(e) = floor(rank(src) * w(e) / outw(src))   per edge
  *   dangling   = sum of rank over nodes with no out-edges
  *   rank'(n)   = floor((1-d)·scale/N)
  *              + floor(d · (Σ_in contrib + floor(dangling/N)))
  *
  * 100 TB shape: ranks shuffle by node key, edges by src — two
  * hash-partitionable equi-joins + one aggregation per iteration, the
  * same plan a Pregel superstep lowers to; the dangling term is a
  * scalar (broadcast). The driver loop carries only iteration count
  * and truncates lineage per round ([[Dedup]] CC-loop idiom).
  */
object PageRank {

  val scale = 1000000000L // 1e9 fixed-point units of rank mass

  /** Ranks after `iterations` rounds over `edges(src, dst, w)` (w a
    * positive integral weight). Returns (node, rank_units LONG). */
  def run(edges: DataFrame, iterations: Int,
      dampNum: Long = 17L, dampDen: Long = 20L): DataFrame = {
    require(iterations >= 0 && dampNum > 0 && dampDen > dampNum)
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val n = nodes.count() // scalar; node-table job, not corpus-sized
    require(n > 0, "empty graph")
    // per-source normalization mass (outw) rides on each edge
    val outw = e.groupBy("src").agg(sum("w").as("outw"))
    val eNorm = e.join(outw, "src").localCheckpoint()
    val baseTerm = (dampDen - dampNum) * scale / dampDen / n // floor((1-d)·scale/N)
    var ranks = nodes.withColumn("rank", lit(scale / n)).localCheckpoint()
    for (_ <- 1 to iterations) {
      val dangling = ranks.join(outw, ranks("node") === outw("src"), "left_anti")
        .agg(coalesce(sum("rank"), lit(0L))).head.getLong(0) // scalar
      val contribs = eNorm
        .join(ranks, eNorm("src") === ranks("node"))
        .select(col("dst").as("node"),
          // integral `div`: exact floor arithmetic on both engines.
          // Overflow bound: rank·w < 2^63, i.e. per-edge weight below
          // ~9.2e9 at full 1e9 rank mass — downscale weights past that.
          expr("(rank * w) div outw").as("c"))
        .groupBy("node").agg(sum("c").as("in_sum"))
      ranks = nodes
        .join(contribs, Seq("node"), "left_outer")
        .select(col("node"),
          (lit(baseTerm) +
            expr(s"($dampNum * (coalesce(in_sum, 0L) + ${dangling / n})) div $dampDen"))
            .as("rank"))
        .localCheckpoint()
    }
    ranks
  }

  /** PERSONALIZED PageRank (Haveliwala 2002's topic-sensitive variant,
    * the RANDOM-WALK-WITH-RESTART form graph recommenders and
    * crawl-frontier prioritizers run): identical to [[run]] except the
    * teleport goes to a SEED SET instead of the uniform distribution —
    * initial mass, the (1-d) restart term, and the dangling mass all
    * land on seeds only, split evenly across them:
    *
    *   rank'(n) = 1_S(n)·floor((1-d)·scale/|S|)
    *            + floor(d · (Σ_in contrib + 1_S(n)·floor(dangling/|S|)))
    *
    * Same exact-integer discipline as [[run]] (floor-divided
    * contributions, rational damping), so DuckDB replays the ranks
    * bit-for-bit. Scale shape unchanged: the seed set joins as one
    * extra broadcast-sized flag column on the node table; everything
    * else is the same two hash joins + aggregation per round.
    *
    * `seeds`' first column = node ids (must be a subset of the graph's
    * nodes or isolated extras — extras receive teleport mass and leak
    * it back through the dangling term, the standard PPR closure). */
  def runPersonalized(edges: DataFrame, seeds: DataFrame, iterations: Int,
      dampNum: Long = 17L, dampDen: Long = 20L): DataFrame = {
    require(iterations >= 0 && dampNum > 0 && dampDen > dampNum)
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
    val sd = seeds.select(col(seeds.columns.head).as("node")).distinct()
      .localCheckpoint()
    val nS = sd.count()
    require(nS > 0, "empty seed set")
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .union(sd.select(col("node")))
      .distinct()
      .join(sd.withColumn("is_seed", lit(true)), Seq("node"), "left")
      .select(col("node"), coalesce(col("is_seed"), lit(false)).as("is_seed"))
      .localCheckpoint()
    val outw = e.groupBy("src").agg(sum("w").as("outw"))
    val eNorm = e.join(outw, "src").localCheckpoint()
    val baseSeed = (dampDen - dampNum) * scale / dampDen / nS
    var ranks = nodes
      .select(col("node"), col("is_seed"),
        when(col("is_seed"), lit(scale / nS)).otherwise(lit(0L)).as("rank"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val dangling = ranks.join(outw, ranks("node") === outw("src"), "left_anti")
        .agg(coalesce(sum("rank"), lit(0L))).head.getLong(0)
      val contribs = eNorm
        .join(ranks, eNorm("src") === ranks("node"))
        .select(col("dst").as("node"), expr("(rank * w) div outw").as("c"))
        .groupBy("node").agg(sum("c").as("in_sum"))
      ranks = nodes
        .join(contribs, Seq("node"), "left_outer")
        .select(col("node"), col("is_seed"),
          (when(col("is_seed"), lit(baseSeed)).otherwise(lit(0L)) +
            expr(s"($dampNum * (coalesce(in_sum, 0L) + " +
              s"if(is_seed, ${dangling / nS}, 0L))) div $dampDen"))
            .as("rank"))
        .localCheckpoint()
    }
    ranks.select("node", "rank")
  }

  /** Driver-side double-precision replay (the spec's independent
    * witness): same iteration structure without fixed-point floors. */
  def runReference(edges: Seq[(String, String, Long)], iterations: Int,
      damping: Double = 0.85): Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size
    val outw = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iterations) {
      val dangling = nodes.filterNot(outw.contains).map(rank).sum
      val in = edges.groupBy(_._2).view.mapValues(_.map { case (s, _, w) =>
        rank(s) * w / outw(s)
      }.sum).toMap
      rank = nodes.map(nd => nd ->
        ((1 - damping) / n + damping * (in.getOrElse(nd, 0.0) + dangling / n))).toMap
    }
    rank
  }

  /** Double-precision PPR replay — [[runPersonalized]]'s independent
    * spec witness (teleport/init/dangling all restricted to seeds). */
  def runPersonalizedReference(edges: Seq[(String, String, Long)],
      seeds: Set[String], iterations: Int,
      damping: Double = 0.85): Map[String, Double] = {
    val nodes = ((edges.map(_._1) ++ edges.map(_._2)).distinct ++ seeds).distinct
    val nS = seeds.size
    val outw = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var rank = nodes.map(nd => nd -> (if (seeds(nd)) 1.0 / nS else 0.0)).toMap
    for (_ <- 1 to iterations) {
      val dangling = nodes.filterNot(outw.contains).map(rank).sum
      val in = edges.groupBy(_._2).view.mapValues(_.map { case (s, _, w) =>
        rank(s) * w / outw(s)
      }.sum).toMap
      rank = nodes.map(nd => nd -> {
        val tele = if (seeds(nd)) (1 - damping) / nS else 0.0
        val dang = if (seeds(nd)) dangling / nS else 0.0
        tele + damping * (in.getOrElse(nd, 0.0) + dang)
      }).toMap
    }
    rank
  }
}
