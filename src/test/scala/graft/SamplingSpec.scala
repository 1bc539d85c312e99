package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling
import graft.sources.Tables

class SamplingSpec extends SparkSuite {

  private def docs = Tables(spark, sfDir, "documents")
    .select("doc_id", "lang", "n_chars")

  test("weightedSample: exactly k rows, TakeOrderedAndProject plan (no global sort)") {
    val s = Sampling.weightedSample(docs, "doc_id", col("n_chars") + 1, k = 10)
    assert(s.count() === 10)
    val plan = s.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Sort ["), plan) // heap top-k, not a global sort
  }

  test("weightedSample: deterministic under repartition and re-run") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.weightedSample(df, "doc_id", col("n_chars") + 1, k = 15)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids(docs)
    val b = ids(docs.repartition(13))
    val c = ids(docs.orderBy(col("n_chars"))) // row order must not matter
    assert(a === b && a === c)
  }

  test("weightedSample: scale-invariant in the weights (A-ES key is ln(u)/w)") {
    // u^(1/w) ranking depends only on weight RATIOS — a global rescale
    // must select the identical sample. This holds exactly on the RAW
    // key (ln(u)/(c·w) = (1/c)·ln(u)/w, order-preserving); the declared
    // query path rounds to an ABSOLUTE 8-dp grid for the cross-engine
    // cutoff, which is deliberately not scale-free, so the property is
    // asserted on the unrounded ranking.
    def ids(w: org.apache.spark.sql.Column) =
      docs.withColumn("k", Sampling.esKey(col("doc_id"), w))
        .orderBy(col("k").desc, col("doc_id")).limit(15)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(col("n_chars") + 1) === ids((col("n_chars") + 1) * 1000.0))
  }

  test("weightedSample: raising one row's weight never evicts it") {
    val base = Sampling.weightedSample(docs, "doc_id", col("n_chars") + 1, k = 15)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val someId = base.head
    // double that row's weight only: ln(u)/w moves toward 0 (u<1 ⇒ ln<0),
    // so its rank can only improve
    val boosted = Sampling.weightedSample(docs, "doc_id",
        when(col("doc_id") === someId, (col("n_chars") + 1) * 2).otherwise(col("n_chars") + 1),
        k = 15)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(boosted.contains(someId))
  }

  test("weightedSample: selection is length-biased (weight ∝ n_chars² favors long docs)") {
    val all = docs.agg(avg(col("n_chars"))).head.getDouble(0)
    // weight = n_chars²: clear length bias while the 8-dp rounding grid
    // stays fine enough to separate almost all keys (only u within
    // ~1e-3 of 1 can floor to 0) — an extreme weight like n_chars⁴
    // would floor every large doc's key to 0 and turn the cutoff into
    // the doc_id tie-break
    val w = pow(col("n_chars").cast("double"), 2)
    val sampled = Sampling.weightedSample(docs, "doc_id", w, k = 20)
      .agg(avg(col("n_chars"))).head.getDouble(0)
    assert(sampled > all,
      s"length-weighted sample mean $sampled should exceed corpus mean $all")
  }

  test("weightedSamplePerStratum: min(k, |stratum|) rows per lang, same key math") {
    val k = 5
    val per = Sampling.weightedSamplePerStratum(docs, "doc_id", "lang",
      col("n_chars") + 1, k)
    val sizes = per.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val strata = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.keySet === strata.keySet)
    for ((lang, n) <- strata) assert(sizes(lang) === math.min(k.toLong, n), lang)
    // within a stratum the selected keys are the stratum's top-k — no
    // cross-stratum leakage
    val es = Sampling.esKeyRounded(col("doc_id"), col("n_chars") + 1)
    val full = docs.withColumn("es_key", es)
    for ((lang, _) <- strata.take(3)) {
      val expect = full.filter(col("lang") === lang)
        .orderBy(col("es_key").desc, col("doc_id"))
        .limit(k).select("doc_id").collect().map(_.getLong(0)).toSet
      val got = per.filter(col("lang") === lang)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got === expect, lang)
    }
  }

  test("per-stratum sampling plans as the bounded-heap TopKPerKeyExec, not a window sort") {
    // weightedSamplePerStratum is the rank<=k window-filter shape the
    // opt-in TopKPerKeyRule rewrites: per-task bounded heaps instead of
    // a full per-stratum sort — the declared q89 inherits this
    val per = Sampling.weightedSamplePerStratum(docs, "doc_id", "lang",
      col("n_chars") + 1, k = 5)
    val plan = per.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("temperatureMix: budget respected, caps at group size, α endpoints behave") {
    import org.apache.spark.sql.functions.{sum => fsum}
    val budget = 60L
    def allocs(alpha: Double) =
      Sampling.temperatureMix(docs, "doc_id", "lang", alpha, budget)
        .groupBy("lang").agg(count(lit(1)).as("got"),
          first("alloc").as("alloc"), first("n_g").as("n_g"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val half = allocs(0.5)
    assert(half.values.map(_._1).sum <= budget) // floor allocation never overshoots
    half.values.foreach { case (got, alloc, ng) =>
      assert(got === alloc && alloc <= ng)
    }
    // α = 0: every group weighs 1 → uniform floor(budget / G)
    val uniform = allocs(0.0)
    val g = uniform.size
    uniform.values.foreach { case (_, alloc, ng) =>
      assert(alloc === math.min(budget / g, ng))
    }
    // α = 1 allocates proportionally; α = 0.5 flattens: the largest
    // group's share must strictly shrink between the two
    val prop = allocs(1.0)
    val big = prop.maxBy(_._2._3)._1
    assert(half(big)._2 < prop(big)._2,
      s"alpha=0.5 should flatten the largest group: ${half(big)} vs ${prop(big)}")
  }

  test("esKey matches a from-scratch reference (MessageDigest md5, JVM log)") {
    val rows = docs.limit(8)
      .withColumn("es_key", Sampling.esKey(col("doc_id"), col("n_chars") + 1))
      .select("doc_id", "n_chars", "es_key").collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    for (r <- rows) {
      val id = r.getLong(0); val w = r.getLong(1) + 1.0
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      val bucket = Integer.parseInt(hex, 16)
      val expect = math.log((bucket + 1).toDouble / 65537.0) / w
      assert(math.abs(r.getDouble(2) - expect) < 1e-12, s"doc $id")
    }
  }

  test("negativeSample: k rows per anchor, never the anchor itself, deterministic") {
    val ids = docs.select("doc_id")
    val neg = Sampling.negativeSample(ids, "doc_id", k = 3, numParts = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val n = ids.count()
    assert(neg.length == n * 3)
    assert(neg.groupBy(_._1).forall { case (_, rows) =>
      rows.map(_._2).sorted.toSeq == Seq(1, 2, 3) })
    assert(neg.forall { case (a, _, ng) => a != ng }, "anchor drawn as its own negative")
    val again = Sampling.negativeSample(ids.repartition(9), "doc_id", k = 3, numParts = 6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(neg.toSet == again.toSet, "draws must not depend on partitioning")
    // uniform-ish coverage: with 1500 draws over 500 ids, no id should
    // dominate (a degenerate hash would collapse onto few targets)
    val hist = neg.groupBy(_._3).view.mapValues(_.size)
    assert(hist.values.max <= 20, s"suspiciously hot negative: ${hist.maxBy(_._2)}")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("epochMix: from-scratch replay — equal shares, epoch cap, remainder prefix") {
    import spark.implicits._
    val toy = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), // g_tok = 60
      (4L, "b", 5L)                                   // g_tok = 5
    ).toDF("doc_id", "grp", "n_tok")
    // totalBudget=100, maxEpochs=3, 2 groups → share 50
    //   a: budget = min(180, 50) = 50 → e=0, rem=50
    //   b: budget = min(15, 50) = 15 → e=3, rem=0 → doc 4 gets 3 copies
    val got = Sampling.epochMix(toy, "doc_id", "grp", col("n_tok"),
        totalBudget = 100L, maxEpochs = 3, numParts = 3)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got(4L) == 3L, got.toString)
    // group a remainder: replay the md5 order and running sum driver-side
    val aDocs = Seq(1L -> 10L, 2L -> 20L, 3L -> 30L).sortBy(d => (md5hex(d._1.toString), d._1))
    var cum = 0L
    val expectA = aDocs.map { case (id, tok) =>
      val start = cum; cum += tok
      id -> (if (start < 50L) 1L else 0L)
    }.toMap
    Seq(1L, 2L, 3L).foreach(id => assert(got(id) == expectA(id), s"doc $id: $got vs $expectA"))
    // consumed tokens for a: full epochs 0 + remainder-prefix docs only
    assert(got.filterKeys(_ != 4L).map { case (id, c) =>
      c * Map(1L -> 10L, 2L -> 20L, 3L -> 30L)(id) }.sum >= 50L - 30L + 1)
  }

  test("epochMix: partitioning-invariant and window-free remainder math") {
    def run(df: org.apache.spark.sql.DataFrame, parts: Int) =
      Sampling.epochMix(df, "doc_id", "lang", col("n_chars").cast("long") / 10 + 1,
        totalBudget = 5000L, maxEpochs = 2, numParts = parts)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    val d = docs
    val a = run(d, 4)
    val b = run(d.repartition(11), 7)
    assert(a == b, "epochMix must not depend on physical partitioning")
    assert(a.exists(_._3 > 0), "budget should select something")
  }

  test("prefixSumBy equals the per-group window spelling") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i.toLong, s"g${i % 5}", (i % 13 + 1).toLong))
      .toDF("id", "grp", "v")
    val got = graft.operators.GlobalIds
      .prefixSumBy(df, "grp", "v", "cum", numParts = 6, col("id"))
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val exp = df.withColumn("cum", sum("v").over(w))
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp)
  }
}
