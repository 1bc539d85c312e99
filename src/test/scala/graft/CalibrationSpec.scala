package graft

import org.apache.spark.sql.functions._

import graft.operators.Calibration

/** Calibration metrics: rational fast-sigmoid exactness, bin-edge
  * placement, a perfectly calibrated planted bin (ECE = 0), and
  * hand-computed Brier. */
class CalibrationSpec extends SparkSuite {

  test("fastSigmoidUnits: exact integer sigmoid — center, scale points, monotone, saturating") {
    import spark.implicits._
    val s = 1000L
    val ms = Seq(-100000L, -3000L, -1000L, -1L, 0L, 1L, 999L, 1000L, 3000L, 100000L)
    val got = ms.toDF("m")
      .select(col("m"), Calibration.fastSigmoidUnits(col("m"), s).as("p"))
      .orderBy("m").collect().map(r => r.getLong(0) -> r.getLong(1))
    // exact reference: 500000 + sign*500000*|m|/(s+|m|) in integer math
    def ref(m: Long): Long =
      500000L + math.signum(m) * (500000L * math.abs(m)) / (s + math.abs(m))
    got.foreach { case (m, p) => assert(p === ref(m), s"m=$m") }
    assert(ref(0L) === 500000L)
    assert(ref(s) === 750000L && ref(-s) === 250000L)
    val ps = got.map(_._2)
    assert(ps === ps.sorted, "monotone in margin")
    assert(ps.head > 0L && ps.last < 1000000L, "saturates strictly inside (0, 1)")
  }

  test("binaryCalibration: perfectly calibrated bin has ece 0; Brier hand-computed") {
    import spark.implicits._
    // 4 rows at p = 0.75: predict positive; 3 correct, 1 wrong ->
    // bin conf 0.75 == accuracy 0.75 -> ECE exactly 0
    val scored = Seq(
      (750000L, true), (750000L, true), (750000L, true), (750000L, false)
    ).toDF("p_units", "y")
    val r = Calibration.binaryCalibration(scored, "p_units", "y").collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getInt(0) === 5, "conf 0.75 -> bin (750000-500000)/50000 = 5")
    assert(row.getLong(1) === 4L)
    assert(row.getDouble(2) === 0.75 && row.getDouble(3) === 0.75)
    assert(row.getDouble(4) === 0.0, "calibrated -> ece 0")
    // Brier = (3*(0.25)^2 + 1*(0.75)^2) / 4 = 0.1875 exactly
    assert(row.getDouble(5) === 0.1875)
  }

  test("bin edges: 0.5 -> bin 0, 0.55 -> bin 1, 1.0 clamps to bin 9; miscalibration registers") {
    import spark.implicits._
    val scored = Seq(
      (500000L, false),  // conf 0.5  -> bin 0 (pred negative-ish: p not > 0.5)
      (549999L, true),   // conf ~0.55- -> bin 0
      (550000L, true),   // bin 1
      (1000000L, false)  // conf 1.0 -> bin 9; predicted true, y false -> wrong
    ).toDF("p_units", "y")
    val rows = Calibration.binaryCalibration(scored, "p_units", "y")
      .orderBy("bin").collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(0, 1, 9))
    val b9 = rows.last
    // the confidently-wrong row: conf 1.0, accuracy 0 -> big ece share
    assert(b9.getDouble(2) === 1.0 && b9.getDouble(3) === 0.0)
    assert(b9.getDouble(4) > 0.25, "confidently-wrong must dominate ece")
  }

  /** Classic sequential pool-adjacent-violators over (n, pos) buckets
    * in order — the independent reference the minimax formulation must
    * reproduce. */
  private def referencePav(groups: Seq[(Long, Long)]): Seq[Double] = {
    // stack of pooled blocks (n, pos)
    val st = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)] // n, pos, width
    groups.foreach { case (n, pos) =>
      var cur = (n, pos, 1)
      while (st.nonEmpty && {
        val (pn, pp, _) = st.last
        pp.toDouble / pn >= cur._2.toDouble / cur._1
      }) {
        val (pn, pp, pw) = st.remove(st.length - 1)
        cur = (pn + cur._1, pp + cur._2, pw + cur._3)
      }
      st += cur
    }
    st.toSeq.flatMap { case (n, pos, w) => Seq.fill(w)(pos.toDouble / n) }
  }

  test("isotonicFit: textbook violator pools to the weighted average; monotone output") {
    import spark.implicits._
    // 4 score levels, 10 obs each, rates 0.1 / 0.5 / 0.3 / 0.7:
    // PAV pools levels 2-3 to 0.4; the rest stand
    val rows = for {
      (score, rate) <- Seq((0L, 0.1), (1L, 0.5), (2L, 0.3), (3L, 0.7))
      i <- 0 until 10
    } yield (score, i < rate * 10)
    val df = rows.toDF("m", "y")
    val r = Calibration.isotonicFit(df, "m", "y", bins = 4)
      .orderBy("bin").collect()
    assert(r.map(_.getAs[Double]("raw_rate")).toSeq === Seq(0.1, 0.5, 0.3, 0.7))
    assert(r.map(_.getAs[Double]("iso_rate")).toSeq === Seq(0.1, 0.4, 0.4, 0.7))
  }

  test("conformalGate: threshold is the exact k-th order statistic; guarantee holds; guards fire") {
    import spark.implicits._
    // ids 0..999, score = id (nonconformity = -id): calibration split
    // is the md5 half, threshold replayable by sorting
    val df = (0L until 1000L).map(i => (i, i)).toDF("id", "score")
    val r = Calibration.conformalGate(df, "id", "score", 1L, 10L)
      .orderBy("split").collect()
    val nCal = r(0).getAs[Long]("n_cal")
    val k = r(0).getAs[Long]("k_cal")
    assert(k === math.min(nCal, ((nCal + 1) * 9 + 9) / 10))
    // independent replay of the k-th smallest calibration nonconformity
    val calScores = (0L until 1000L).filter { i =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8")).take(2)
        .map("%02x".format(_)).mkString
      Integer.parseInt(hex, 16) < 32768
    }.map(i => -i).sorted
    assert(nCal === calScores.length.toLong)
    val t = calScores(k.toInt - 1)
    assert(r(0).getAs[Long]("threshold") === t)
    // by construction at most alpha of the calibration split exceeds t
    assert(r(0).getAs[Long]("n_flagged").toDouble / nCal <= 0.1 + 1e-9)
    assert(r.map(_.getAs[String]("split")).toSeq === Seq("calibration", "test"))
    intercept[IllegalArgumentException](
      Calibration.conformalGate(df, "id", "score", 10L, 10L))
    intercept[IllegalArgumentException](
      Calibration.conformalGate(df.limit(0), "id", "score"))
  }

  test("isotonicFit: property — minimax fit == sequential PAV on random bucket data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (1 to 5).foreach { trial =>
      val levels = 2 + rnd.nextInt(7)
      val rows = for {
        s <- 0 until levels
        n = 1 + rnd.nextInt(6)
        i <- 0 until n
      } yield (s.toLong, rnd.nextInt(4) > 1)
      val df = rows.toDF("m", "y")
      val got = Calibration.isotonicFit(df, "m", "y", bins = levels)
        .orderBy("bin").collect()
      val groups = rows.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (_, g) => (g.size.toLong, g.count(_._2).toLong) }
      val want = referencePav(groups)
      def round4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
      assert(got.map(_.getAs[Double]("iso_rate")).toSeq === want.map(round4),
        s"trial $trial: groups $groups")
      // monotone by construction
      val iso = got.map(_.getAs[Double]("iso_rate"))
      assert(iso.zip(iso.tail).forall { case (a, b) => a <= b })
    }
  }
}
