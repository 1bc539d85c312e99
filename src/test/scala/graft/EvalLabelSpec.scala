package graft

import org.apache.spark.sql.functions._

import graft.operators.{Calibration, LabelModel, Similarity, TextAnalysis}

/** Unit specs for the round-9 eval/labeling operators: character
  * entropy, the weak-supervision label model, centroid silhouette, and
  * ROC-AUC. (Cross-engine value parity is covered by the DuckDB oracle
  * gate — q182–q185.) */
class EvalLabelSpec extends SparkSuite {
  import spark.implicits._

  test("charEntropy: constant run is 0 bits (flagged), uniform 4-symbol text is exactly 2 bits") {
    val docs = Seq(
      (1L, "aaaaaaaa"),             // one symbol -> H = 0
      (2L, "abcdabcdabcdabcd"),     // four symbols, uniform -> H = 2 exactly
      (3L, null.asInstanceOf[String]),
      (4L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Double]("entropy") === 0.0)
    assert(r(0).getAs[Boolean]("flag_low_entropy"))
    assert(r(1).getAs[Double]("entropy") === 2.0)
    assert(!r(1).getAs[Boolean]("flag_low_entropy")) // flag is STRICT H < 2
    assert(r(2).isNullAt(r(2).fieldIndex("entropy")))
    assert(r(2).isNullAt(r(2).fieldIndex("len_used")))
    assert(r(3).getAs[Long]("len_used") === 0L)
    assert(r(3).isNullAt(r(3).fieldIndex("entropy")))
  }

  test("charEntropyStats kernel: naive replay on random strings; eager codegen; UTF-8 code points") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val T = graft.plans.CharEntropyExpr.log2Units
    assert(T.toSeq === TextAnalysis.log2UnitsTable, "one table, two views")
    def naive(s: String, prefix: Int): (Long, Long, Long) = {
      val cps = s.codePoints().toArray.take(prefix)
      val l = cps.length.toLong
      val counts = cps.groupBy(identity).values.map(_.length)
      val hnum = if (l > 0) l * T(l.toInt - 1) - counts.map(c => c.toLong * T(c - 1)).sum else 0L
      (l, counts.size.toLong, hnum)
    }
    val expr = graft.plans.CharEntropyExpr.CharEntropyStatsExpr(
      BoundReference(0, StringType, nullable = true), 512)
    val proj = GenerateUnsafeProjection.generate(Seq(expr)) // compiles eagerly
    val rnd = new scala.util.Random(3)
    val samples = (1 to 100).map(_ =>
      (1 to rnd.nextInt(600)).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString) ++
      Seq("", "日本語 spark 日本語", "café haché")
    samples.foreach { s =>
      val row = InternalRow(UTF8String.fromString(s))
      val st = proj(row).getStruct(0, 3)
      val (l, d, h) = naive(s, 512)
      assert((st.getLong(0), st.getLong(1), st.getLong(2)) === ((l, d, h)), s"input: '$s'")
      val interp = expr.eval(row).asInstanceOf[InternalRow]
      assert((interp.getLong(0), interp.getLong(1), interp.getLong(2)) === ((l, d, h)))
    }
    assert(proj(InternalRow(null)).isNullAt(0))
  }

  test("charEntropy: bounds to the 512-char prefix and counts distinct chars there") {
    val docs = Seq((1L, "ab" * 600)).toDF("doc_id", "text") // 1200 chars
    val r = TextAnalysis.charEntropy(docs, "doc_id", "text").head()
    assert(r.getAs[Long]("len_used") === 512L)
    assert(r.getAs[Long]("n_distinct") === 2L)
    assert(r.getAs[Double]("entropy") === 1.0) // uniform a/b -> exactly 1 bit
  }

  test("lfVotes: each labeling function fires on its own evidence; nulls dropped") {
    // 64 distinct ALPHABETIC words (normalization strips digits), mean
    // length in [3,10], 4 panel stopwords
    val good = ((0 until 60)
      .map(i => s"wo${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
      .mkString(" ") + " the be to of")
    val docs = Seq(
      (1L, good),                   // passes all five rules
      (2L, "the the the the the"),  // fails wordcount/distinct/maxfreq
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val r = LabelModel.lfVotes(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert(r.length === 2) // null-text rater abstains entirely
    assert(r(0).getAs[Long]("votes") === 5L)
    assert(r(0).getAs[Boolean]("lf_wordcount") && r(0).getAs[Boolean]("lf_maxfreq"))
    assert(!r(1).getAs[Boolean]("lf_distinct")) // 1 distinct of 5 words
    assert(!r(1).getAs[Boolean]("lf_maxfreq"))  // 5*10 > 5
  }

  test("fleissAgreement: unanimous-but-split panel has kappa exactly 1") {
    // half the items voted 5-0, half 0-5: P_o = 1, p1 = 0.5 -> kappa = 1
    val votes = (Seq.fill(10)(5L) ++ Seq.fill(10)(0L)).toDF("votes")
    val r = LabelModel.fleissAgreement(votes, "votes", 5)
      .orderBy("votes").collect()
    assert(r.map(_.getAs[Long]("votes")).toSeq === Seq(0L, 5L))
    assert(r.forall(_.getAs[Double]("kappa") === 1.0))
    assert(r.forall(_.getAs[Double]("p_o") === 1.0))
    assert(r(0).getAs[Boolean]("majority_keep") === false)
    assert(r(1).getAs[Boolean]("majority_keep") === true)
  }

  test("fleissAgreement: coin-flip panel sits near kappa 0") {
    // every vote count equally likely -> agreement is what chance predicts
    val votes = (0 to 5).flatMap(v => Seq.fill(6)(v.toLong)).toDF("votes")
    val k = LabelModel.fleissAgreement(votes, "votes", 5)
      .head().getAs[Double]("kappa")
    assert(math.abs(k) < 0.35, s"kappa $k should be near 0 for a uniform panel")
  }

  test("centroidSilhouette: tight well-separated clusters score near 1") {
    val a = Array(1f, 0f, 0f); val b = Array(0f, 1f, 0f)
    def jig(v: Array[Float], eps: Float) = v.map(_ + eps).updated(2, eps)
    val emb = Seq(
      (0L, a), (1L, b), // the two centroids (pred: vec_id < 2)
      (2L, jig(a, 0.01f)), (3L, jig(a, 0.02f)),
      (4L, jig(b, 0.01f)), (5L, jig(b, 0.02f))).toDF("vec_id", "embedding")
    val r = Similarity.centroidSilhouette(emb, "vec_id", "embedding",
      col("vec_id") < 2).orderBy("cent_id").collect()
    assert(r.length === 2)
    assert(r.forall(_.getAs[Double]("avg_sil") > 0.9))
    assert(r.forall(_.getAs[Double]("overall_sil") > 0.9))
    assert(r.map(_.getAs[Long]("n")).sum === 6L) // centroids score themselves too
  }

  test("centroidSilhouette: a boundary vector scores near 0") {
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (2L, Array(1f, 1f))).toDF("vec_id", "embedding") // equidistant
    val r = Similarity.centroidSilhouette(emb, "vec_id", "embedding",
      col("vec_id") < 2).agg(min("overall_sil")).head.getDouble(0)
    // 2 of 3 vectors are the centroids themselves (s = 1); the boundary
    // vector contributes ~0 -> overall ~ 2/3
    assert(r < 0.7 && r > 0.6)
  }

  test("rocAuc: perfect separation 1.0, all-ties 0.5, reversed 0.0; empty side null") {
    val perfect = Seq((10L, true), (9L, true), (2L, false), (1L, false))
      .toDF("m", "y")
    assert(Calibration.rocAuc(perfect, "m", "y").head.getAs[Double]("auc") === 1.0)
    val ties = Seq((5L, true), (5L, true), (5L, false), (5L, false)).toDF("m", "y")
    assert(Calibration.rocAuc(ties, "m", "y").head.getAs[Double]("auc") === 0.5)
    val rev = Seq((1L, true), (2L, false)).toDF("m", "y")
    assert(Calibration.rocAuc(rev, "m", "y").head.getAs[Double]("auc") === 0.0)
    val onesided = Seq((1L, true), (2L, true)).toDF("m", "y")
    val r = Calibration.rocAuc(onesided, "m", "y").head
    assert(r.isNullAt(r.fieldIndex("auc")))
  }

  test("rocAuc: tie correction matches the hand-computed rank statistic") {
    // scores: pos {3, 2}, neg {2, 1}: pairs = 4; pos3>both(2), pos2: >neg1,
    // ties neg2 (0.5) -> U = 3.5, AUC = 0.875
    val d = Seq((3L, true), (2L, true), (2L, false), (1L, false)).toDF("m", "y")
    assert(Calibration.rocAuc(d, "m", "y").head.getAs[Double]("auc") === 0.875)
  }

  test("domainKl: a domain distributed like the corpus diverges 0; a skewed one matches the quantized replay") {
    // two domains with IDENTICAL word mixes -> corpus mix == each
    // domain's mix -> every term ln(1) = 0 -> KL exactly 0
    val same = Seq(("a", "x x y"), ("b", "x x y")).toDF("lang", "text")
    val r0 = TextAnalysis.domainKl(same, "lang", "text")
      .orderBy("lang").collect()
    assert(r0.map(_.getAs[Double]("kl")).toSeq === Seq(0.0, 0.0))
    assert(r0(0).getAs[Long]("n_tokens") === 3L)
    assert(r0(0).getAs[Long]("n_types") === 2L)

    // skewed: dom a = {x:2, y:1}, dom b = {y:1}; corpus {x:2, y:2}
    val skew = Seq(("a", "x x y"), ("b", "y")).toDF("lang", "text")
    val r = TextAnalysis.domainKl(skew, "lang", "text")
      .orderBy("lang").collect()
    // independent quantized replay of p*ln(p/q) -> 1e-6-unit terms
    def t6(cdw: Long, nd: Long, cw: Long, n: Long): Long = {
      val p = cdw.toDouble / nd.toDouble
      val q = cw.toDouble / n.toDouble
      math.floor(p * math.log(p / q) * 1e6 + 0.5).toLong
    }
    val klA = (t6(2, 3, 2, 4) + t6(1, 3, 2, 4)) / 1e6
    val klB = t6(1, 1, 2, 4) / 1e6
    def round4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(r(0).getAs[Double]("kl") === round4(klA))
    assert(r(1).getAs[Double]("kl") === round4(klB))
    assert(r(1).getAs[Double]("kl") > 0.69) // ~ln 2: b is all-y vs half-y corpus
  }
}
