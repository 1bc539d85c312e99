package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.sources.{Sinks, Tables}

class SinksAndSkewSpec extends SparkSuite {

  test("partitioned parquet round-trip with partition pruning") {
    val li = Tables(spark, sfDir, "lineitem")
    val dir = Files.createTempDirectory("sink_pq").toString
    Sinks.writePartitioned(li, dir, Seq("l_returnflag"))
    val back = Sinks.read(spark, dir)
    assert(back.count() === li.count())
    val pruned = back.filter(col("l_returnflag") === "R")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("l_returnflag"))
    assert(pruned.count() === li.filter(col("l_returnflag") === "R").count())
  }

  test("csv, json and orc round-trips preserve row counts and values") {
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "lang", "n_chars")
    for (fmt <- Seq("csv", "json", "orc")) {
      val dir = Files.createTempDirectory(s"sink_$fmt").toString
      Sinks.writePartitioned(docs, dir, Seq("lang"), fmt)
      val back = Sinks.read(spark, dir, fmt)
        .select(col("doc_id").cast("long"), col("lang"), col("n_chars").cast("long"))
      assert(back.count() === docs.count(), s"$fmt count")
      assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty, s"$fmt values")
    }
  }

  test("schema evolution: mergeSchema unions drifted snapshots; old rows null-fill") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sink_evolve").toString
    // snapshot 1: two columns; snapshot 2 (later ingest) added `lang`
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.parquet(s"$dir/batch=1")
    Seq((3L, "gamma", "en")).toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/batch=2")
    val merged = Sinks.readEvolved(spark, dir)
    assert(merged.columns.toSet == Set("doc_id", "text", "lang", "batch"))
    val rows = merged.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(rows == Map(1L -> null, 2L -> null, 3L -> "en"))
    // DataFrame-level drift: unionByName(allowMissingColumns) gives the
    // same contract without touching file footers
    val a = Seq((1L, "alpha")).toDF("doc_id", "text")
    val b = Seq((3L, "gamma", "en")).toDF("doc_id", "text", "lang")
    val u = a.unionByName(b, allowMissingColumns = true)
    assert(u.columns.toSet == Set("doc_id", "text", "lang"))
    assert(u.filter(col("doc_id") === 1L).select("lang").head.isNullAt(0))
  }

  test("compaction merges a many-file directory, preserving rows") {
    val docs = Tables(spark, sfDir, "documents")
    val scattered = Files.createTempDirectory("scatter").toString
    docs.repartition(50).write.mode("overwrite").parquet(scattered)
    val compacted = Files.createTempDirectory("compact").toString
    Sinks.compact(spark, scattered, compacted)
    val files = new java.io.File(compacted).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files === 1, s"tiny table should compact to 1 file, got $files")
    assert(spark.read.parquet(compacted).count() === docs.count())
  }

  test("observed metrics ride along with the action (no second scan)") {
    val docs = Tables(spark, sfDir, "documents")
    val sink = graft.sources.Observe.attach(spark)
    try {
      val observed = graft.sources.Observe.health(docs, "docs_health", "text")
      val n = observed.count()
      val m = sink.await("docs_health")
      assert(m.getAs[Long]("n_rows") === n)
      assert(m.getAs[Long]("n_null") === docs.filter(col("text").isNull).count())
      assert(m.getAs[Long]("total_len") > 0)
    } finally spark.listenerManager.unregister(sink)
  }

  test("salted aggregate == direct aggregate on a skewed key") {
    val li = Tables(spark, sfDir, "lineitem") // l_returnflag is low-cardinality/hot
    val salted = Skew.saltedAggregate(li, "l_returnflag", 8,
      Seq("l_orderkey", "l_linenumber"), Seq("l_quantity"))
      .select(col("l_returnflag"), col("n"), round(col("sum_l_quantity"), 2).as("s"))
    val direct = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("s"))
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("salted join == plain join") {
    val li = Tables(spark, sfDir, "lineitem")
    val part = Tables(spark, sfDir, "part")
    val salted = Skew.saltedJoin(li, part, "l_partkey", "p_partkey",
      salts = 8, bigSaltSource = Seq("l_orderkey", "l_linenumber"))
      .select("l_orderkey", "l_linenumber", "p_brand")
    val plain = li.join(part, col("l_partkey") === col("p_partkey"))
      .select("l_orderkey", "l_linenumber", "p_brand")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("hybrid hot/cold join == plain join; plan splits into broadcast + shuffle legs") {
    import spark.implicits._
    // skewed frame: one key carries half the rows
    val big = ((1 to 5000).map(i => (if (i % 2 == 0) 7L else (i % 97).toLong, i.toLong)))
      .toDF("k", "payload")
    val small = (0L to 96L).map(k => (k, s"dim$k")).toDF("sk", "name")
    val hybrid = Skew.hybridJoin(big, small, "k", "sk", hotK = 3)
      .select("k", "payload", "name")
    val plain = big.join(small, col("k") === col("sk")).select("k", "payload", "name")
    assert(hybrid.exceptAll(plain).isEmpty && plain.exceptAll(hybrid).isEmpty)
    val p = hybrid.queryExecution.executedPlan.toString
    // two legs under a Union; the hot leg broadcasts by construction
    // (the cold leg ALSO broadcasts at spec scale — AQE promotes the
    // tiny dim — and reverts to a shuffle join at real dimension sizes)
    assert(p.contains("BroadcastHashJoin"), s"hot leg must broadcast\n$p")
    assert(p.contains("Union"), "two legs must union")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // duplicate-key small side: row multiplication preserved through the split
    val dupSmall = small.unionByName(Seq((7L, "dup7")).toDF("sk", "name"))
    val h2 = Skew.hybridJoin(big, dupSmall, "k", "sk", hotK = 2).select("k", "payload", "name")
    val p2 = big.join(dupSmall, col("k") === col("sk")).select("k", "payload", "name")
    assert(h2.exceptAll(p2).isEmpty && p2.exceptAll(h2).isEmpty)
  }

  test("salted left-outer join == plain left join, unmatched rows null-extend exactly once") {
    val li = Tables(spark, sfDir, "lineitem")
    // restrict the dimension so a real fraction of fact rows is unmatched
    val part = Tables(spark, sfDir, "part").filter(col("p_size") <= 25)
    val salted = Skew.saltedJoin(li, part, "l_partkey", "p_partkey",
      salts = 8, bigSaltSource = Seq("l_orderkey", "l_linenumber"),
      joinType = "left_outer")
      .select("l_orderkey", "l_linenumber", "p_brand")
    val plain = li.join(part, col("l_partkey") === col("p_partkey"), "left_outer")
      .select("l_orderkey", "l_linenumber", "p_brand")
    // multiset equality: counts every null-extension — a per-salt
    // duplicate or a dropped unmatched row both fail here
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.filter(col("p_brand").isNull).count() > 0,
      "fixture must exercise the unmatched path")
  }

  test("salted right/full outer joins are rejected, not miscomputed") {
    val li = Tables(spark, sfDir, "lineitem")
    val part = Tables(spark, sfDir, "part")
    for (jt <- Seq("right_outer", "full_outer", "left_semi"))
      intercept[IllegalArgumentException] {
        Skew.saltedJoin(li, part, "l_partkey", "p_partkey",
          salts = 8, bigSaltSource = Seq("l_orderkey"), joinType = jt)
      }
  }

  test("manifest publish: round-trip validates; a lost part file and a duplicate are caught") {
    import spark.implicits._
    import graft.sources.Sinks
    val dir = java.nio.file.Files.createTempDirectory("manifest").toString + "/snap"
    val df = (1L to 500L).map(i => (i, s"row $i payload")).toDF("id", "text")
      .repartition(4)
    Sinks.writeWithManifest(df, dir, "id", Seq("text"))
    val ok = Sinks.validateManifest(spark, dir)
    assert(ok._1, ok.toString)
    // lose one part file → rows and digest both disagree
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts.length == 4)
    val victim = parts.head
    // stash OUTSIDE the directory (Spark reads any non-hidden file in it)
    val stash = new java.io.File(new java.io.File(dir).getParent, "stash.bak")
    assert(victim.renameTo(stash))
    val lost = Sinks.validateManifest(spark, dir)
    assert(!lost._1 && lost._3 < lost._2, lost.toString)
    // duplicate task output (the same part landing twice) → caught too
    assert(stash.renameTo(victim))
    java.nio.file.Files.copy(victim.toPath,
      new java.io.File(victim.getParent, victim.getName.replace("part-0", "part-9")).toPath)
    val dup = Sinks.validateManifest(spark, dir)
    assert(!dup._1 && dup._3 > dup._2, dup.toString)
  }

  test("bloom-filtered parquet: an equality needle probe skips row groups min/max cannot") {
    val n = 400000L
    // high-cardinality key in RANDOM order: every row group's min/max
    // spans ~the whole md5 domain, so stats-based pruning is useless —
    // exactly the case the bloom filter exists for
    val df = spark.range(n).select(col("id"),
        md5(col("id").cast("string")).as("k"))
      .orderBy(md5(concat(lit("shuffle"), col("id").cast("string"))))
      .coalesce(1)
    val root = java.nio.file.Files.createTempDirectory("bloom").toString
    val withBloom = s"$root/on"; val without = s"$root/off"
    // small row groups so one file holds many (the skip granularity)
    Sinks.writeBloomFiltered(df, withBloom, "k", ndv = n, rowGroupBytes = 1L << 20)
    df.write.mode("overwrite")
      .option("parquet.block.size", (1L << 20).toString).parquet(without)
    val key = spark.read.parquet(without)
      .filter(col("id") === 12345L).head.getString(1)
    def scanned(dir: String): Long = {
      val q = spark.read.parquet(dir).filter(col("k") === key)
      assert(q.count() === 1) // same answer both layouts
      q.collect()
      val scan = q.queryExecution.executedPlan.collectLeaves().head
      scan.metrics("numOutputRows").value
    }
    val plain = scanned(without)
    val bloomed = scanned(withBloom)
    // without blooms the scan decodes every row group (min/max useless);
    // with blooms only the groups that MIGHT contain the needle decode —
    // assert a conservative 4x collapse (measured ~30x: one or two row
    // groups of ~25k rows vs 400k)
    assert(plain === n, s"plain scan should decode everything, got $plain")
    assert(bloomed * 4 <= plain, s"bloom scan decoded $bloomed of $plain rows — filter not engaging")
  }
}

class BucketingSpec extends SparkSuite {
  test("persisted band index: the daily fuzzy-match join shuffles ONLY the new shard") {
    // the q122 at-scale claim, proven: the old corpus's LSH bands land
    // once in a bucketed table keyed by the (band-qualified) hash; the
    // daily candidate join then plans with an exchange on the NEW
    // shard's bands only — the index side reads pre-bucketed
    import org.apache.spark.sql.functions._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val docs = Tables(spark, sfDir, "documents")
      val bucket = graft.operators.Splits.hashBucket(col("doc_id"))
      // band-qualified single key so the bucket spec covers the whole join key
      def keyed(df: org.apache.spark.sql.DataFrame) =
        graft.operators.Dedup.minhashBands(df, "doc_id", "text", n = 1, k = 12, bands = 2)
          .select(col("doc_id"), md5(concat_ws("|", col("band_idx"), col("bh"))).as("bkey"))
      Sinks.writeBucketed(keyed(docs.filter(bucket < 58982)), "band_idx_tbl", 8, "bkey")
      val idx = spark.table("band_idx_tbl").withColumnRenamed("doc_id", "old_id")
      val newB = keyed(docs.filter(bucket >= 58982)).withColumnRenamed("doc_id", "new_id")
      val cand = idx.join(newB, "bkey").select("old_id", "new_id").distinct()
      // executedPlan, not sparkPlan: exchanges are only inserted by
      // EnsureRequirements during execution preparation
      val plan = cand.queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning\\(bkey".r.findAllIn(plan).size == 1,
        s"exactly one side (the new shard) may shuffle on the join key:\n$plan")
      // candidate set equals the all-in-memory band join
      val direct = {
        val o = keyed(docs.filter(bucket < 58982)).withColumnRenamed("doc_id", "old_id")
        val n2 = keyed(docs.filter(bucket >= 58982)).withColumnRenamed("doc_id", "new_id")
        o.join(n2, "bkey").select("old_id", "new_id").distinct()
      }
      assert(cand.exceptAll(direct).isEmpty && direct.exceptAll(cand).isEmpty)
      assert(cand.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS band_idx_tbl")
    }
  }

  test("bucketed co-located join and aggregation plan without exchanges") {
    import org.apache.spark.sql.functions._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Sinks.writeBucketed(Tables(spark, sfDir, "lineitem"), "li_b", 8, "l_orderkey")
      Sinks.writeBucketed(Tables(spark, sfDir, "orders"), "o_b", 8, "o_orderkey")
      val j = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      // executedPlan: sparkPlan predates EnsureRequirements, so it NEVER
      // contains exchanges and a no-Exchange assertion on it is vacuous
      val jPlan = j.queryExecution.executedPlan.toString
      assert(jPlan.contains("SortMergeJoin") && !jPlan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$jPlan")
      assert(j.count() === Tables(spark, sfDir, "lineitem")
        .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey")).count())
      val agg = spark.table("li_b").groupBy("l_orderkey").agg(sum("l_quantity"))
      val aPlan = agg.queryExecution.executedPlan.toString
      assert(!aPlan.contains("Exchange"), s"bucketed agg should not shuffle:\n$aPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
