package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** [[graft.operators.TextAnalysis.encodingDamage]] (q214's operator):
  * each signature family on planted strings, clean text stays clean,
  * and the pattern literals themselves are pinned by codepoint so a
  * source-encoding accident (the one failure mode of literal-bearing
  * patterns) breaks the build, not the oracle. */
class EncodingDamageSpec extends SparkSuite {
  import spark.implicits._

  private def damage(s: String): (Long, Long, Long, Boolean) = {
    val r = TextAnalysis.encodingDamage(Seq(s).toDF("t"), "t")
      .select("n_double_enc", "n_replacement", "n_c1", "is_damaged").head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))
  }

  test("double-encoded UTF-8 signatures count per occurrence") {
    // "été" double-encoded: Ã© twice
    assert(damage("Ã©tÃ©") == ((2L, 0L, 0L, true)))
    // cp1252 curly-quote family: â€™
    assert(damage("itâ€™s fine") == ((1L, 0L, 0L, true)))
  }

  test("replacement chars and stray C1 controls count separately") {
    assert(damage("a�b�c") == ((0L, 2L, 0L, true)))
    assert(damage("x\u0085y\u009Fz") == ((0L, 0L, 2L, true)))
  }

  test("clean text — including properly encoded accents — is clean") {
    assert(damage("déjà vu — naïve œuvre ‘quoted’") == ((0L, 0L, 0L, false)))
    assert(damage("plain ascii text") == ((0L, 0L, 0L, false)))
    assert(damage("") == ((0L, 0L, 0L, false)))
  }

  test("null text is clean, not an error") {
    val r = TextAnalysis.encodingDamage(
      Seq[(Long, Option[String])]((1L, None)).toDF("id", "t"), "t")
      .select("is_damaged").head
    assert(!r.getBoolean(0))
  }

  test("pattern literals are codepoint-pinned (source-encoding tripwire)") {
    assert(TextAnalysis.doubleEncPat.codePoints().toArray.toSeq == Seq(
      0xC3, '[', 0xA7, 0xA8, 0xA9, 0xB1, 0xB6, 0xBC, ']', '|',
      0xE2, 0x20AC, '[', 0x153, 0x2019, 0x201C, 0x2122, ']').map(_.toInt))
    assert(TextAnalysis.replacementPat.codePoints().toArray.toSeq == Seq(0xFFFD))
    assert(TextAnalysis.c1Pat == "[\\x{0080}-\\x{009F}]")
  }
}
