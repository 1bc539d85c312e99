package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.functions.TextFunctions

/** The relational operator inventory (SURVEY.md §2.3 Q1–Q23): scans,
  * filters, hash/broadcast/outer/semi/anti/range joins, hash and
  * grouping-set aggregation, windows, sorts, top-k, set ops, and the
  * scalar function families. Every query is deterministic (total ORDER
  * BY) and oracle-checked against DuckDB on the same parquet.
  *
  * Scale stance: all plans are declarative DataFrame trees, so Catalyst
  * provides pushdown/pruning; joins against the small dimensions carry
  * an explicit `broadcast()` hint; everything else shuffles on its
  * natural key and leans on AQE for skew/coalescing at 100 TB.
  */
object Relational {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** Revenue expression shared by several queries (per-row double math —
    * identical IEEE ops in DuckDB). */
  private def revenue: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** Order-independent money sum: per-row doubles are bit-identical
    * across engines, the DECIMAL(18,6) cast rounds them identically,
    * and decimal addition is exact and associative — so the sum no
    * longer depends on partition/merge order (double sums across a
    * shuffle do, and can flip a round(,2) boundary between engines).
    * Final cast back to DOUBLE keeps the output schema simple. */
  private def moneySum(c: Column): Column =
    round(sum(c.cast("decimal(18,6)")), 2).cast("double")

  // ---------------------------------------------------------------- Q1
  /** The reference's one true query (src/main.cc end-to-end): inverted
    * index over `documents` — tokenize → normalize → distinct(word,doc)
    * → group → `word:[ids]` lines bucketed by first letter, ordered by
    * (letter, doc-frequency DESC, word ASC). See
    * [[graft.operators.InvertedIndex]] for the file-sink variant with
    * reference-exact `a.txt`…`z.txt` output. */
  val q01 = QueryDef("q01_inverted_index",
    """WITH toks AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok FROM documents
      |), words AS (
      |  SELECT DISTINCT doc_id, regexp_replace(lower(tok), '[^a-z]', '', 'g') AS word FROM toks
      |), idx AS (
      |  SELECT word, list_sort(list(doc_id)) AS ids, count(*) AS cnt
      |  FROM words WHERE length(word) > 0 GROUP BY word
      |)
      |SELECT substring(word, 1, 1) AS letter,
      |       word || ':[' || array_to_string(ids, ' ') || ']' AS line
      |FROM idx ORDER BY letter, cnt DESC, word""") { (s, dir) =>
    // No explicit distinct: collect_set dedups (word, doc) pairs inside
    // its partial aggregation, so the whole index needs ONE shuffle —
    // the reference's map-side combine (O6) and global dedup (O8) both
    // happen in partial_collect_set before the exchange.
    t(s, dir, "documents")
      // native single-pass tokenizer (tokenize+normalize+filter), then
      // explode — identical rows to the split→regex→filter pipeline
      .select(col("doc_id"), explode(TextFunctions.normalizedWords(col("text"))).as("word"))
      .groupBy("word")
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .select(
        substring(col("word"), 1, 1).as("letter"),
        concat(col("word"), lit(":["), concat_ws(" ", col("ids")), lit("]")).as("line"),
        size(col("ids")).as("cnt"), col("word"))
      .orderBy(col("letter"), col("cnt").desc, col("word"))
      .select("letter", "line")
  }

  // ---------------------------------------------------------------- Q2
  val q02 = QueryDef("q02_filter_project",
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      |WHERE l_quantity < 10 ORDER BY l_orderkey, l_linenumber""") { (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_quantity") < 10) // pushed to the parquet scan
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")
  }

  // ---------------------------------------------------------------- Q3
  val q03 = QueryDef("q03_agg_tpch1",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_rev,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(min(l_extendedprice), 2) AS min_price,
      |  round(max(l_extendedprice), 2) AS max_price,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""") { (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(revenue).as("sum_rev"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(min(col("l_extendedprice")), 2).as("min_price"),
        round(max(col("l_extendedprice")), 2).as("max_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  // ---------------------------------------------------------------- Q4
  val q04 = QueryDef("q04_count_distinct",
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
      |       count(DISTINCT l_suppkey) AS n_supps
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
      .orderBy("l_returnflag")
  }

  /** HLL sketch variant — ORACLE-CHECKED since round 12 (the q77
    * rank-band graduation trick): the sketch VALUE differs across
    * engines, but its accuracy contract's band does not — the released
    * row is the exact distinct count plus the ±3·rsd envelope
    * (rsd = 0.05, Spark's default; 3σ because rsd is a standard
    * DEVIATION, not a hard bound), all derived from the exact count and
    * so DuckDB-replayable, plus `within_3rsd` computed from the REAL
    * HLL++ estimate with the oracle spelling the contract's expected
    * constant true — a sketch-accuracy collapse hash-mismatches the
    * driver row (HLL++ register-max merge is order-insensitive, so the
    * estimate is deterministic for fixed input and the gate can never
    * flake). The estimate itself stays in-query behind a loud require. */
  val q04b = QueryDef("q04b_approx_distinct",
    """SELECT l_returnflag,
      |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      |       CAST(floor(count(DISTINCT l_partkey) * 0.85) AS BIGINT) AS band_lo,
      |       CAST(ceil(count(DISTINCT l_partkey) * 1.15) AS BIGINT) AS band_hi,
      |       true AS within_3rsd
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, dir) =>
    val gated = t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(
        col("l_returnflag"), col("exact_parts"),
        floor(col("exact_parts") * 0.85).cast("long").as("band_lo"),
        ceil(col("exact_parts") * 1.15).cast("long").as("band_hi"),
        col("approx_parts"),
        (col("approx_parts") >= floor(col("exact_parts") * 0.85) &&
          col("approx_parts") <= ceil(col("exact_parts") * 1.15)).as("within_3rsd"))
    val bad = gated.filter(!col("within_3rsd")).collect()
    require(bad.isEmpty,
      s"approx_count_distinct outside the 3*rsd envelope: ${bad.mkString("; ")}")
    gated.select("l_returnflag", "exact_parts", "band_lo", "band_hi", "within_3rsd")
      .orderBy("l_returnflag")
  }

  // ---------------------------------------------------------------- Q5
  val q05 = QueryDef("q05_join_agg",
    """SELECT c_mktsegment, count(*) AS n_orders,
      |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""") { (s, dir) =>
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy("c_mktsegment")
  }

  // ---------------------------------------------------------------- Q6
  val q06 = QueryDef("q06_broadcast_join",
    """SELECT p_brand, count(*) AS n, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""") { (s, dir) =>
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), moneySum(col("l_extendedprice")).as("sum_price"))
      .orderBy("p_brand")
  }

  // ---------------------------------------------------------------- Q7
  /** TPC-H Q5-shaped multi-way join. Fact-fact joins shuffle on their
    * keys; nation/region ride a broadcast hint (tiny at any SF). */
  val q07 = QueryDef("q07_multiway_join",
    """SELECT r_name, n_name,
      |       CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
      |       count(*) AS n
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""") { (s, dir) =>
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(moneySum(revenue).as("revenue"), count(lit(1)).as("n"))
      .orderBy("r_name", "n_name")
  }

  // ---------------------------------------------------------------- Q8
  val q08 = QueryDef("q08_left_outer",
    """SELECT c_custkey, count(o_orderkey) AS n_orders
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey ORDER BY c_custkey""") { (s, dir) =>
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy("c_custkey")
  }

  // ---------------------------------------------------------------- Q9
  val q09 = QueryDef("q09_semi_join",
    """SELECT c_custkey FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""") { (s, dir) =>
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey")
      .orderBy("c_custkey")
  }

  // --------------------------------------------------------------- Q10
  val q10 = QueryDef("q10_anti_join",
    """SELECT c_custkey FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""") { (s, dir) =>
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey")
      .orderBy("c_custkey")
  }

  // --------------------------------------------------------------- Q11
  /** Equi key + timestamp range predicate — the scalable range-join
    * shape (hash join on the key, range as residual filter). */
  val q11 = QueryDef("q11_range_join",
    """SELECT l_returnflag, count(*) AS n
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      | AND l_shipdate >= o_orderdate
      | AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
      |GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, dir) =>
    val l = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
    l.join(o, l("l_orderkey") === o("o_orderkey")
        && l("l_shipdate") >= o("o_orderdate")
        && l("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** Pure inequality (theta) join — broadcast nested loop on a small
    * side; at scale this is exactly the plan you'd want (broadcast the
    * 100-row supplier dim, stream lineitem-sized fact past it). */
  val q11b = QueryDef("q11b_theta_join",
    """SELECT s1.s_suppkey AS s_suppkey, count(*) AS n_richer
      |FROM supplier s1 JOIN supplier s2 ON s1.s_acctbal < s2.s_acctbal
      |GROUP BY s1.s_suppkey ORDER BY s_suppkey""") { (s, dir) =>
    val s1 = t(s, dir, "supplier").alias("s1")
    val s2 = t(s, dir, "supplier").alias("s2")
    s1.join(broadcast(s2), col("s1.s_acctbal") < col("s2.s_acctbal"))
      .groupBy(col("s1.s_suppkey").as("s_suppkey"))
      .agg(count(lit(1)).as("n_richer"))
      .orderBy("s_suppkey")
  }

  // --------------------------------------------------------------- Q12
  /** Rollup with grouping flags; group keys coalesced to "(all)" so the
    * oracle never compares NULL ordering semantics across engines. */
  val q12 = QueryDef("q12_rollup",
    """SELECT coalesce(o_orderpriority, '(all)') AS prio,
      |       coalesce(o_orderstatus, '(all)') AS status,
      |       CAST(grouping(o_orderpriority) AS INT) AS g_prio,
      |       CAST(grouping(o_orderstatus) AS INT) AS g_status,
      |       count(*) AS n, CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
      |ORDER BY g_prio, g_status, prio, status""") { (s, dir) =>
    t(s, dir, "orders")
      .rollup("o_orderpriority", "o_orderstatus")
      .agg(
        grouping(col("o_orderpriority")).cast("int").as("g_prio"),
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        count(lit(1)).as("n"),
        moneySum(col("o_totalprice")).as("sum_price"))
      .select(
        coalesce(col("o_orderpriority"), lit("(all)")).as("prio"),
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        col("g_prio"), col("g_status"), col("n"), col("sum_price"))
      .orderBy("g_prio", "g_status", "prio", "status")
  }

  /** Explicit GROUPING SETS through the engine's SQL entry point
    * (views registered via [[Tables.registerAll]], then `spark.sql` —
    * the same text a DuckDB user would write). */
  val q12b = QueryDef("q12b_grouping_sets",
    """SELECT coalesce(o_orderpriority, '(all)') AS prio,
      |       coalesce(o_orderstatus, '(all)') AS status,
      |       CAST(grouping(o_orderpriority) AS INT) AS g_prio,
      |       CAST(grouping(o_orderstatus) AS INT) AS g_status,
      |       count(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
      |ORDER BY g_prio, g_status, prio, status""") { (s, dir) =>
    t(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql("""SELECT coalesce(o_orderpriority, '(all)') AS prio,
            |       coalesce(o_orderstatus, '(all)') AS status,
            |       CAST(grouping(o_orderpriority) AS INT) AS g_prio,
            |       CAST(grouping(o_orderstatus) AS INT) AS g_status,
            |       count(*) AS n
            |FROM orders
            |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
            |ORDER BY g_prio, g_status, prio, status""".stripMargin)
  }

  // --------------------------------------------------------------- Q13
  val q13 = QueryDef("q13_cube",
    """SELECT coalesce(l_returnflag, '(all)') AS rf,
      |       coalesce(l_linestatus, '(all)') AS ls,
      |       CAST(grouping(l_returnflag) AS INT) AS g_rf,
      |       CAST(grouping(l_linestatus) AS INT) AS g_ls,
      |       count(*) AS n
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY g_rf, g_ls, rf, ls""") { (s, dir) =>
    t(s, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
        coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
        col("g_rf"), col("g_ls"), col("n"))
      .orderBy("g_rf", "g_ls", "rf", "ls")
  }

  // --------------------------------------------------------------- Q14
  val q14 = QueryDef("q14_window_rank",
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
      |         row_number() OVER w AS rn, rank() OVER w AS rnk
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |) WHERE rn <= 3 ORDER BY o_custkey, rn""") { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("rnk", rank().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"), col("rn"), col("rnk"))
      .orderBy("o_custkey", "rn")
  }

  // --------------------------------------------------------------- Q14b
  /** `rank() <= k` — the WITH-TIES top-k idiom: boundary ties are kept,
    * so the result is deterministic even though o_orderdate ties within
    * a customer (unlike a row_number bound, which would need a
    * tiebreak). Plans as the with-ties TopKPerKeyExec flavor under
    * GraftExtensions (plan-asserted in PlanAssertionsSpec). */
  val q14b = QueryDef("q14b_window_rank_ties",
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey,
      |         CAST(rank() OVER w AS INT) AS rnk,
      |         CAST(dense_rank() OVER w AS INT) AS drnk
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate)
      |) WHERE rnk <= 3 ORDER BY o_custkey, rnk, o_orderkey""") { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rnk"), col("drnk"))
      .orderBy("o_custkey", "rnk", "o_orderkey")
  }

  // --------------------------------------------------------------- Q15
  /** Running-frame sum + lag delta. Accumulation order is fixed by the
    * (o_orderdate, o_orderkey) total order, so doubles agree across
    * engines before rounding. */
  val q15 = QueryDef("q15_window_frame",
    """SELECT o_custkey, o_orderkey,
      |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER (PARTITION BY o_custkey
      |         ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_sum,
      |       round(o_totalprice - lag(o_totalprice) OVER (PARTITION BY o_custkey
      |         ORDER BY o_orderdate, o_orderkey), 2) AS delta,
      |       round(lead(o_totalprice) OVER (PARTITION BY o_custkey
      |         ORDER BY o_orderdate, o_orderkey), 2) AS next_price
      |FROM orders ORDER BY o_custkey, o_orderkey""") { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("running_sum",
        round(sum(col("o_totalprice").cast("decimal(18,6)")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).cast("double"))
      .withColumn("delta", round(col("o_totalprice") - lag(col("o_totalprice"), 1).over(w), 2))
      .withColumn("next_price", round(lead(col("o_totalprice"), 1).over(w), 2))
      .select("o_custkey", "o_orderkey", "running_sum", "delta", "next_price")
      .orderBy("o_custkey", "o_orderkey")
  }

  // --------------------------------------------------------------- Q16
  /** Global top-k: Spark's `orderBy.limit` compiles to TakeOrderedAndProject —
    * per-partition heaps + driver merge of k rows, no global sort. */
  val q16 = QueryDef("q16_topk",
    """SELECT l_orderkey, l_linenumber,
      |       round(l_extendedprice * (1.0 - l_discount), 2) AS revenue
      |FROM lineitem
      |ORDER BY l_extendedprice * (1.0 - l_discount) DESC, l_orderkey, l_linenumber
      |LIMIT 20""") { (s, dir) =>
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        round(revenue, 2).as("revenue"), revenue.as("rev_exact"))
      .orderBy(col("rev_exact").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(20)
      .select("l_orderkey", "l_linenumber", "revenue")
  }

  // --------------------------------------------------------------- Q17
  val q17 = QueryDef("q17_setops",
    """SELECT 'except' AS op, c_custkey FROM (
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |  EXCEPT SELECT o_custkey FROM orders)
      |UNION ALL
      |SELECT 'intersect' AS op, c_custkey FROM (
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |  INTERSECT SELECT o_custkey FROM orders)
      |ORDER BY op, c_custkey""") { (s, dir) =>
    val building = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val withOrders = t(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
    building.except(withOrders).withColumn("op", lit("except"))
      .unionByName(building.intersect(withOrders).withColumn("op", lit("intersect")))
      .select("op", "c_custkey")
      .orderBy("op", "c_custkey")
  }

  // --------------------------------------------------------------- Q18
  val q18 = QueryDef("q18_string_fns",
    """SELECT p_partkey, lower(p_name) AS lname, substring(p_name, 1, 5) AS pfx,
      |       regexp_replace(p_name, '[aeiou]', '', 'g') AS novowel,
      |       concat_ws('-', p_brand, p_type) AS bt,
      |       CAST(length(p_name) AS INT) AS len,
      |       CAST(abs(p_size - 25) AS INT) AS size_dev
      |FROM part ORDER BY p_partkey""") { (s, dir) =>
    t(s, dir, "part").select(
        col("p_partkey"),
        lower(col("p_name")).as("lname"),
        substring(col("p_name"), 1, 5).as("pfx"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("novowel"),
        concat_ws("-", col("p_brand"), col("p_type")).as("bt"),
        length(col("p_name")).as("len"),
        abs(col("p_size") - 25).as("size_dev"))
      .orderBy("p_partkey")
  }

  // --------------------------------------------------------------- Q19
  val q19 = QueryDef("q19_date_fns",
    """SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |       CAST(year(o_orderdate) AS INT) AS yr,
      |       CAST(quarter(o_orderdate) AS INT) AS qtr,
      |       count(*) AS n, CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY month, yr, qtr ORDER BY month""") { (s, dir) =>
    t(s, dir, "orders")
      .groupBy(
        date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"))
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy("month")
  }

  // --------------------------------------------------------------- Q20
  /** Array functions over the Q1 posting lists (scalars in the output so
    * the oracle never hash-compares raw arrays). */
  val q20 = QueryDef("q20_array_fns",
    """WITH toks AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok FROM documents
      |), words AS (
      |  SELECT DISTINCT doc_id, regexp_replace(lower(tok), '[^a-z]', '', 'g') AS word FROM toks
      |), idx AS (
      |  SELECT word, list_sort(list(doc_id)) AS ids
      |  FROM words WHERE length(word) > 0 GROUP BY word
      |)
      |SELECT word, CAST(len(ids) AS INT) AS n_ids, ids[1] AS first_id,
      |       list_contains(ids, 1) AS has_doc1
      |FROM idx ORDER BY word""") { (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"), explode(TextFunctions.normalizedWords(col("text"))).as("word"))
      .groupBy("word")
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .select(col("word"), size(col("ids")).as("n_ids"),
        element_at(col("ids"), 1).as("first_id"),
        array_contains(col("ids"), lit(1L)).as("has_doc1"))
      .orderBy("word")
  }

  // --------------------------------------------------------------- Q21
  val q21 = QueryDef("q21_json_fns",
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k,
      |       json_keys(props)[1] AS first_key
      |FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
      |ORDER BY event_id""") { (s, dir) =>
    // JSON parsing is a CPU-bound narrow map: rebalance off the single
    // scan split (no-op once the input has >= cores splits)
    graft.sources.Balance.cpuBound(t(s, dir, "events"))
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        element_at(map_keys(from_json(col("props"), "map<string,string>",
          Map.empty[String, String])), 1).as("first_key"))
      .filter(col("k").isNotNull)
      .orderBy("event_id")
  }

  // --------------------------------------------------------------- Q22
  /** Tumbling time window (batch form of the streaming aggregate; the
    * streaming twin lives in graft.streaming and is equivalence-tested). */
  val q22 = QueryDef("q22_tumbling_window",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
      |       event_type, count(*) AS n, CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
      |FROM events GROUP BY hour_start, event_type
      |ORDER BY hour_start, event_type""") { (s, dir) =>
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("hour_start", "event_type")
  }

  // --------------------------------------------------------------- Q23
  /** Gap-based sessionization via lag(); 30-minute inactivity closes a
    * session. Integer-second truncation on both sides. */
  val q23 = QueryDef("q23_sessionize",
    """WITH x AS (
      |  SELECT user_id, ts,
      |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events
      |), f AS (
      |  SELECT user_id, CASE WHEN prev_ts IS NULL
      |           OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM x)
      |SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
      |       count(*) AS n_events
      |FROM f GROUP BY user_id ORDER BY user_id""") { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull
          || unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
          .otherwise(0))
      .groupBy("user_id")
      .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  // --------------------------------------------------------------- Q41
  /** Pivot (wide aggregation): revenue by month × return flag. Fixed
    * pivot values so both engines emit identical static columns. */
  val q41 = QueryDef("q41_pivot",
    """SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |       CAST(round(coalesce(sum(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS DECIMAL(18,6))), 0), 2) AS DOUBLE) AS F,
      |       CAST(round(coalesce(sum(CAST(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END AS DECIMAL(18,6))), 0), 2) AS DOUBLE) AS O,
      |       CAST(round(coalesce(sum(CAST(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END AS DECIMAL(18,6))), 0), 2) AS DOUBLE) AS P
      |FROM orders GROUP BY month ORDER BY month""") { (s, dir) =>
    t(s, dir, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(col("o_totalprice").cast("decimal(18,6)")))
      .select(col("month"),
        round(coalesce(col("F"), lit(0)), 2).cast("double").as("F"),
        round(coalesce(col("O"), lit(0)), 2).cast("double").as("O"),
        round(coalesce(col("P"), lit(0)), 2).cast("double").as("P"))
      .orderBy("month")
  }

  // --------------------------------------------------------------- Q42
  /** Statistical aggregates: stddev/variance (Welford-merged on both
    * engines — agree well inside 4 dp), correlation, exact interpolated
    * percentiles (Spark percentile == DuckDB quantile_cont). */
  val q42 = QueryDef("q42_stats",
    """SELECT l_returnflag,
      |       round(stddev_samp(l_quantity), 4) AS sd_qty,
      |       round(var_samp(l_discount), 4) AS var_disc,
      |       round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
      |       round(quantile_cont(l_quantity, 0.5), 4) AS med_qty,
      |       round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_discount")), 4).as("var_disc"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
        round(expr("percentile(l_quantity, 0.5)"), 4).as("med_qty"),
        round(expr("percentile(l_quantity, 0.9)"), 4).as("p90_qty"))
      .orderBy("l_returnflag")
  }

  val all: Seq[QueryDef] = Seq(
    q01, q02, q03, q04, q04b, q05, q06, q07, q08, q09, q10,
    q11, q11b, q12, q12b, q13, q14, q14b, q15, q16, q17, q18, q19, q20,
    q21, q22, q23, q41, q42)
}
