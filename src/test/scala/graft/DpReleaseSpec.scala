package graft

import org.apache.spark.sql.functions._

import graft.operators.DpRelease

/** The DP count-release mechanism: exact-integer inverse CDF,
  * engine-replayable draws, distribution shape, and the clamp. */
class DpReleaseSpec extends SparkSuite {

  test("noiseThresholds: symmetric power-of-two weights, total 3*2^B-2, mode at 0") {
    for (b <- Seq(1, 4, 20)) {
      val ts = DpRelease.noiseThresholds(b)
      assert(ts.length === 2 * b + 1)
      assert(ts.last._1 === DpRelease.totalWeight(b))
      val widths = ts.map(_._1).zip(0L +: ts.map(_._1).init).map { case (hi, lo) => hi - lo }
      // width(k) = 2^(B-|k|): symmetric, maximal at k = 0
      assert(widths === widths.reverse)
      assert(widths(b) === (1L << b))
      assert(widths.head === 1L && widths.last === 1L)
      assert(ts.map(_._2) === (-b to b))
    }
  }

  test("noisyCounts: deterministic, JVM replay agrees bit-for-bit, |noise| <= B, clamped >= 0") {
    import spark.implicits._
    val b = 20
    val rows = (1 to 4000).map(i => (i.toLong, s"g${i % 200}"))
    val df = rows.toDF("id", "grp")
    val out = DpRelease.simulatedNoisyCounts(df, Seq("grp"), "seed-a", b)
      .orderBy("grp").collect()
    assert(out.length === 200)
    // pure-JVM replay of the draw + inverse CDF for every group
    val md = java.security.MessageDigest.getInstance("MD5")
    def replayNoise(key: String): Long = {
      val hex = md.digest(s"seed-a|$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      val u = java.lang.Long.parseLong(hex, 16) % DpRelease.totalWeight(b)
      DpRelease.noiseThresholds(b).find(u < _._1).get._2.toLong
    }
    out.foreach { r =>
      val (grp, exact, noise, noisy) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(noise === replayNoise(grp), s"engine/JVM draw mismatch for $grp")
      assert(math.abs(noise) <= b)
      assert(noisy === math.max(exact + noise, 0L))
      assert(exact === 20L)
    }
    // same seed -> identical release; different seed -> different noise somewhere
    val again = DpRelease.simulatedNoisyCounts(df, Seq("grp"), "seed-a", b)
      .orderBy("grp").collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
    val other = DpRelease.simulatedNoisyCounts(df, Seq("grp"), "seed-b", b)
      .orderBy("grp").collect()
    assert(out.map(_.getLong(2)).toSeq !== other.map(_.getLong(2)).toSeq)
  }

  test("noise distribution: mode-0 mass ~ 1/3 and |k|<=1 mass ~ 2/3 over many draws") {
    import spark.implicits._
    // 20k singleton groups = 20k independent draws
    val df = (1 to 20000).map(i => (i.toLong, s"k$i")).toDF("id", "grp")
    val noises = DpRelease.simulatedNoisyCounts(df, Seq("grp"), "dist-seed", 20)
      .select("noise").as[Long].collect()
    val p0 = noises.count(_ == 0L).toDouble / noises.length
    val p1 = noises.count(n => math.abs(n) <= 1L).toDouble / noises.length
    // exact masses: 2^B/T = 0.3333...; (2^B + 2*2^(B-1))/T = 0.6666...
    assert(math.abs(p0 - 1.0 / 3) < 0.02, s"P(0) = $p0")
    assert(math.abs(p1 - 2.0 / 3) < 0.02, s"P(|k|<=1) = $p1")
    // empirical mean near 0 (symmetry)
    val mean = noises.sum.toDouble / noises.length
    assert(math.abs(mean) < 0.05, s"mean = $mean")
  }

  test("noisySums: clipping bounds sensitivity, noise = clip*k, replay agrees") {
    import spark.implicits._
    val b = 20
    val clip = 10L
    // values straddle the clip bound and include negatives (clip to 0)
    val rows = (1 to 3000).map(i => (s"g${i % 50}", (i % 40).toLong - 5))
    val df = rows.toDF("grp", "v")
    val out = DpRelease.simulatedNoisySums(df, Seq("grp"), "v", clip, "sum-seed", b)
      .orderBy("grp").collect()
    assert(out.length === 50)
    val md = java.security.MessageDigest.getInstance("MD5")
    def replayNoise(key: String): Long = {
      val hex = md.digest(s"sum-seed|$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      val u = java.lang.Long.parseLong(hex, 16) % DpRelease.totalWeight(b)
      DpRelease.noiseThresholds(b).find(u < _._1).get._2.toLong
    }
    val exactClipped = rows.groupBy(_._1).view
      .mapValues(_.map(r => math.min(math.max(r._2, 0L), clip)).sum).toMap
    out.foreach { r =>
      val (grp, cs, noise, noisy) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(cs === exactClipped(grp), s"clipped sum wrong for $grp")
      assert(noise === replayNoise(grp) * clip)
      assert(noise % clip === 0L && math.abs(noise) <= b * clip)
      assert(noisy === math.max(cs + noise, 0L))
    }
  }

  test("domain grounding: every domain key is emitted, absent groups are " +
      "noised zeros, present groups identical to the observed-only release") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "grp")
    val domain = Seq("a", "b", "c", "d").toDF("grp")
    val out = DpRelease.simulatedNoisyCounts(df, Seq("grp"), "dom-seed", 20,
      domain = Some(domain)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet === Set("a", "b", "c", "d"),
      "the complete domain must drive the release — absence may not leak")
    assert(out("a")._1 === 2L && out("b")._1 === 1L)
    assert(out("c")._1 === 0L && out("d")._1 === 0L)
    // absent groups still draw their own (deterministic) noise + clamp
    Seq("c", "d").foreach { g =>
      val (_, n, noisy) = out(g)
      assert(math.abs(n) <= 20L && noisy === math.max(n, 0L))
    }
    // present groups: identical rows to the observed-groups release
    val obs = DpRelease.simulatedNoisyCounts(df, Seq("grp"), "dom-seed", 20)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    Seq("a", "b").foreach(g => assert(out(g) === obs(g)))
  }

  test("clamp: zero-heavy groups never release negative counts") {
    import spark.implicits._
    // 1-row groups: exact_count = 1, noise can reach -20 -> clamp to 0
    val df = (1 to 5000).map(i => (i.toLong, s"solo$i")).toDF("id", "grp")
    val out = DpRelease.simulatedNoisyCounts(df, Seq("grp"), "clamp-seed", 20)
    assert(out.filter(col("noisy_count") < 0).count() === 0)
    assert(out.filter(col("noisy_count") === 0).count() > 0,
      "some 1-row groups must clamp (P(noise <= -1) ~ 1/3)")
  }
}
