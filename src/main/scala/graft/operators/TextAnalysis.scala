package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Text-analysis operators for training-data curation: heuristic
  * language ID, quality scoring, token counting, and rolling-hash
  * document fingerprinting. All are per-row column expressions (narrow,
  * no shuffle) except term frequency, which is one hash aggregation —
  * everything stays inside whole-stage codegen.
  */
object TextAnalysis {

  /** Heuristic language ID: per-language stopword-hit counts over the
    * normalized word array; argmax with a fixed language-order
    * tie-break (see [[TextFunctions.langIdOrder]]). `keep` columns are
    * passed through (appended after the score columns) so callers
    * needing input attributes alongside the prediction avoid a
    * re-scan + self-join. */
  def langId(docs: DataFrame, idCol: String, textCol: String,
      keep: Seq[String] = Nil): DataFrame = {
    // all languages scored in ONE pass over the word array (native
    // expression; equality with the per-language composed filters is
    // spec-asserted)
    val scoresCol = "__graft_langid_scores"
    val scored0 = docs
      .withColumn("w", TextFunctions.normalizedWords(col(textCol)))
      .withColumn(scoresCol, graft.plans.TextNormExprs.stopwordScores(
        col("w"), TextFunctions.langIdOrder.map(TextFunctions.stopwords)))
    val scored = TextFunctions.langIdOrder.zipWithIndex.foldLeft(scored0) {
      case (df, (lang, i)) =>
        df.withColumn(s"s_$lang", element_at(col(scoresCol), i + 1))
    }
    // argmax with ties resolved by langIdOrder position (>= keeps the
    // earlier language on equal scores)
    val pred = TextFunctions.langIdOrder.init.zipWithIndex.foldRight(
        lit(TextFunctions.langIdOrder.last): Column) { case ((lang, i), elseCol) =>
      val laterMax = TextFunctions.langIdOrder.drop(i + 1)
        .map(l => col(s"s_$l")).reduce((a, b) => greatest(a, b))
      when(col(s"s_$lang") >= laterMax, lit(lang)).otherwise(elseCol)
    }
    // null text must yield a null prediction, not fall through every
    // null-scored when() into the last language
    val safePred = when(col(textCol).isNull, lit(null)).otherwise(pred)
    scored.select(Seq(col(idCol), safePred.as("pred_lang")) ++
      TextFunctions.langIdOrder.map(l => col(s"s_$l")) ++ keep.map(col): _*)
  }

  /** Document quality features + a composite score in [0,1]:
    * 0.4·min(1, tokens/100) + 0.3·alpha-ratio + 0.3·en-stopword-ratio.
    * Deliberately simple and fully SQL-expressible (oracle-checkable);
    * the shape (feature columns → weighted score) is what matters.
    * `keep` columns pass through (appended) so feature stages chain
    * without a re-scan + self-join — see the q65 curation pipeline. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String,
      keep: Seq[String] = Nil): DataFrame = {
    val t = col(textCol)
    val w = TextFunctions.normalizedWords(t)
    val nTok = size(w)
    val alphaRatio = length(regexp_replace(lower(t), "[^a-z]", "")).cast("double") /
      greatest(length(t), lit(1))
    val stopRatio = TextFunctions.stopwordHits(w, "en").cast("double") /
      greatest(nTok, lit(1))
    val avgWordLen = length(concat_ws("", w)).cast("double") / greatest(nTok, lit(1))
    val score = least(lit(1.0), nTok.cast("double") / 100.0) * 0.4 +
      alphaRatio * 0.3 + stopRatio * 0.3
    import TextFunctions.round4
    graft.sources.Balance.cpuBound(docs).select(Seq(col(idCol), nTok.as("n_tok"),
      round4(alphaRatio).as("alpha_ratio"), round4(stopRatio).as("stop_ratio"),
      round4(avgWordLen).as("avg_word_len"), round4(score).as("score")) ++
      keep.map(col): _*)
  }

  /** Token counts: whitespace tokens and BPE-ish regex tokens (letter
    * runs / digit runs / single other glyph), plus chars-per-token.
    * Counts run through the native single-pass expressions
    * ([[graft.plans.TextNormExprs.WsTokenCountExpr]] /
    * [[graft.plans.TextNormExprs.BpeishCountExpr]]) — no regex, no
    * match-array materialization; equality with the composed
    * split/regexp_extract_all forms is property-asserted. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    graft.sources.Balance.cpuBound(docs).select(col(idCol),
        graft.plans.TextNormExprs.wsTokenCount(t).as("n_ws_tok"),
        graft.plans.TextNormExprs.bpeishCount(lower(t)).as("n_re_tok"),
        length(t).as("__len"))
      .select(col(idCol), col("n_ws_tok"), col("n_re_tok"),
        TextFunctions.round4(col("__len").cast("double") /
          greatest(col("n_re_tok"), lit(1))).as("chars_per_tok"))
  }

  /** Rolling-hash fingerprint: hash every char 8-gram of the lowercased
    * text, keep the minimum ("winnowing-lite") and the concatenation of
    * the bottom-4 hashes as a robust document fingerprint. Runs through
    * the native [[graft.plans.RollingFingerprintExpr]] — one digest
    * instance and a bounded selection per row instead of an interpreted
    * higher-order-function chain (~10× on the fingerprint benchmark;
    * results identical). */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val grams = graft.plans.RollingFingerprintExpr
      .rollingFingerprint(lower(col(textCol)), gramLen = 8, bottomK = 4)
    graft.sources.Balance.cpuBound(docs).select(col(idCol), grams.as("fp"))
      .select(col(idCol),
        element_at(col("fp"), 1).as("fp_min"),
        concat_ws("", col("fp")).as("fp_bottom4"))
  }

  /** Within-document repetition: fraction of duplicate word 3-grams —
    * a standard low-quality/boilerplate signal in LLM data curation
    * (near-1 means the document repeats itself). */
  def repetitionRatio(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val g = TextFunctions.wordShingles(TextFunctions.normalizedWords(col(textCol)), 3)
    // alias the gram array first: referenced twice below, and an alias
    // used twice is not inlined (CollapseProject duplicates only cheap
    // or used-once expressions) — one shingle pass per row, not two
    graft.sources.Balance.cpuBound(docs).select(col(idCol), g.as("__graft_grams"))
      .select(col(idCol), size(col("__graft_grams")).as("n_grams"),
        size(array_distinct(col("__graft_grams"))).as("n_distinct"))
      .select(col(idCol), col("n_grams"), col("n_distinct"),
        // docs too short to have any 3-gram are NOT repetitive — 0, not
        // the 1.0 the naive 1 - 0/1 formula would report
        when(col("n_grams") === 0, lit(0.0))
          .otherwise(TextFunctions.round4(lit(1.0) -
            col("n_distinct").cast("double") / col("n_grams")))
          .as("rep_ratio"))
  }

  /** Gopher repetition battery (Rae et al. 2021, App. A1.1): per doc,
    * the TOP-n-gram character fraction for n∈{2,3,4} (characters
    * claimed by the single most frequent word n-gram; ties broken
    * cnt DESC then gram ASC) and the DUPLICATE-n-gram character
    * fraction for n∈{5,10} (characters claimed by every n-gram
    * occurring ≥2×, overlap-counting — each occurrence counts its full
    * character length, a stated deviation from the paper's
    * character-coverage accounting). Denominator = characters of the
    * space-joined normalized words (min 1). `gopher_keep` applies the
    * paper's thresholds (0.20/0.18/0.16 top; 0.15/0.10 dup); NULL text
    * yields NULL fractions and keep=false.
    *
    * Shape: the battery is per-document, so the production path is a
    * pure NARROW map — one native hash-count kernel per row
    * ([[graft.plans.TextNormExprs.GramRepetitionExpr]]) computes all
    * five widths' statistics without materializing shingle arrays,
    * sorting, or exploding. Zero shuffles besides the caller's
    * ordering — nothing about one document ever meets another, so
    * 1000 executors scan 100 TB with no exchange at all.
    * [[gopherRepetitionExploded]] keeps the distributed-aggregation
    * formulation as the executable spec (equality
    * property-asserted). */
  def gopherRepetition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ns = Seq(2, 3, 4, 5, 10)
    val base = graft.sources.Balance.cpuBound(docs)
      .select(col(idCol), col(textCol).as("__graft_text"),
        TextFunctions.normalizedWords(col(textCol)).as("__graft_w"))
      .withColumn("__graft_dlen",
        greatest(length(concat_ws(" ", col("__graft_w"))), lit(1)))
      .withColumn("__graft_stats",
        graft.plans.TextNormExprs.gramRepetition(col("__graft_w"), ns))
    def frac(c: Column) =
      TextFunctions.round4(c.cast("double") / col("__graft_dlen"))
    def stat(n: Int, field: String) =
      frac(element_at(col("__graft_stats"), ns.indexOf(n) + 1).getField(field))
    val topF = Seq(2, 3, 4).map(stat(_, "topchars"))
    val dupF = Seq(5, 10).map(stat(_, "dupchars"))
    base.select((col(idCol) +:
      (Seq(2, 3, 4).zip(topF).map { case (n, f) =>
        when(col("__graft_text").isNull, lit(null)).otherwise(f).as(s"top${n}gram_frac") } ++
       Seq(5, 10).zip(dupF).map { case (n, f) =>
        when(col("__graft_text").isNull, lit(null)).otherwise(f).as(s"dup${n}gram_frac") } ++
       Seq((col("__graft_text").isNotNull
         && topF(0) <= 0.20 && topF(1) <= 0.18 && topF(2) <= 0.16
         && dupF(0) <= 0.15 && dupF(1) <= 0.10).as("gopher_keep")))): _*)
  }

  /** The distributed-aggregation formulation of [[gopherRepetition]]
    * — ONE explode over the five tagged shingle arrays → one
    * (doc, n, gram) hash aggregation → one (doc, n)-keyed window +
    * aggregation → a (doc)-keyed pivot. Every shuffle key contains
    * doc_id, so state per task is bounded by the longest single
    * document; kept as the executable spec the narrow fold is
    * asserted against (and as the shape you'd want if single
    * documents outgrew task memory). */
  def gopherRepetitionExploded(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ns = Seq(2, 3, 4, 5, 10)
    val base = graft.sources.Balance.cpuBound(docs)
      .select(col(idCol), col(textCol).as("__graft_text"),
        TextFunctions.normalizedWords(col(textCol)).as("__graft_w"))
      .withColumn("__graft_dlen",
        greatest(length(concat_ws(" ", col("__graft_w"))), lit(1)))
    // tag each shingle with its n so ALL five gram lengths ride one
    // explode + one aggregation instead of five corpus passes
    val tagged = concat(ns.map(n =>
      transform(TextFunctions.wordShingles(col("__graft_w"), n),
        g => struct(lit(n).as("n"), g.as("g")))): _*)
    val counts = base.filter(col("__graft_w").isNotNull)
      .select(col(idCol), explode(tagged).as("t"))
      .select(col(idCol), col("t.n").as("n"), col("t.g").as("g"))
      .groupBy(idCol, "n", "g").agg(count(lit(1)).as("cnt"))
    val win = Window.partitionBy(idCol, "n").orderBy(col("cnt").desc, col("g"))
    val agg = counts.withColumn("rn", row_number().over(win))
      .groupBy(idCol, "n")
      .agg(sum(when(col("rn") === 1, col("cnt") * length(col("g"))).otherwise(0L))
        .as("topchars"),
        sum(when(col("cnt") >= 2, col("cnt") * length(col("g"))).otherwise(0L))
          .as("dupchars"))
    val pivotCols =
      ns.map(n => coalesce(max(when(col("n") === n, col("topchars"))), lit(0L))
        .as(s"top$n")) ++
      ns.map(n => coalesce(max(when(col("n") === n, col("dupchars"))), lit(0L))
        .as(s"dup$n"))
    val pivoted = agg.groupBy(idCol).agg(pivotCols.head, pivotCols.tail: _*)
    def frac(c: Column) =
      TextFunctions.round4(coalesce(c, lit(0L)).cast("double") / col("__graft_dlen"))
    base.join(pivoted, Seq(idCol), "left")
      .select((col(idCol) +:
        (Seq(2, 3, 4).map(n => when(col("__graft_text").isNull, lit(null))
          .otherwise(frac(col(s"top$n"))).as(s"top${n}gram_frac")) ++
         Seq(5, 10).map(n => when(col("__graft_text").isNull, lit(null))
          .otherwise(frac(col(s"dup$n"))).as(s"dup${n}gram_frac")) ++
         Seq((col("__graft_text").isNotNull
           && frac(col("top2")) <= 0.20
           && frac(col("top3")) <= 0.18
           && frac(col("top4")) <= 0.16
           && frac(col("dup5")) <= 0.15
           && frac(col("dup10")) <= 0.10).as("gopher_keep")))): _*)
  }

  /** Gopher quality rules (Rae et al. 2021, App. A1.1 — the companion
    * battery to [[gopherRepetition]]): per-doc word count, mean word
    * length, and distinct-stopword presence over the normalized word
    * array, with the paper's keep thresholds (50 ≤ words ≤ 100 000;
    * 3 ≤ mean length ≤ 10; ≥ 2 distinct stop words from the paper's
    * 8-word list). The paper's symbol-ratio and line-shape rules need
    * raw punctuation/newlines, which the byte-wise `[a-z]`
    * normalization this engine standardizes on removes — they are
    * deliberately out of scope here (see [[qualityScore]] for the raw
    * alpha-ratio signal). Per-rule booleans are emitted alongside the
    * composite so a curation pipeline can audit WHICH rule rejected a
    * document. Pure per-row expressions: narrow, shuffle-free, whole
    * battery inside one codegen stage. */
  def gopherQuality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val w = TextFunctions.normalizedWords(col(textCol))
    val n = size(w)
    val mean = TextFunctions.round4(
      length(concat_ws("", w)).cast("double") / greatest(n, lit(1)))
    // array_intersect dedups, so size() counts DISTINCT stop words hit
    val stopDistinct = size(array_intersect(w, array(stops.map(lit): _*)))
    val ruleWc = n >= 50 && n <= 100000
    val ruleMean = mean >= 3.0 && mean <= 10.0
    val ruleStop = stopDistinct >= 2
    def nn(c: Column) = when(col(textCol).isNull, lit(null)).otherwise(c)
    graft.sources.Balance.cpuBound(docs).select(col(idCol),
      nn(n.cast("long")).as("n_words"),
      nn(mean).as("mean_word_len"),
      nn(stopDistinct.cast("long")).as("stop_distinct"),
      nn(ruleWc).as("rule_wordcount"),
      nn(ruleMean).as("rule_meanlen"),
      nn(ruleStop).as("rule_stopwords"),
      (col(textCol).isNotNull && ruleWc && ruleMean && ruleStop)
        .as("gopher_quality_keep"))
  }

  /** Corpus term frequency: raw token counts (no per-doc distinct). */
  def termFrequency(docs: DataFrame, textCol: String): DataFrame =
    graft.sources.Balance.cpuBound(docs)
      .select(explode(TextFunctions.normalizedWords(col(textCol))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Keyed pseudonymization: replace identifier columns with stable
    * salted SHA-256 tokens — the privacy primitive a pipeline applies
    * before data leaves the trust boundary. Same id + same salt → same
    * token, so referential integrity survives (joins and groupings on
    * the token behave exactly like on the raw id — q94 proves it by
    * joining two independently pseudonymized tables), while the raw id
    * is not recoverable without the salt. A narrow codegen'd map: at
    * 100 TB this adds no shuffle and no state. Rotating the salt
    * unlinks releases from each other (the usual re-identification
    * mitigation between data drops). */
  def pseudonymize(df: DataFrame, idCols: Seq[String], salt: String): DataFrame =
    idCols.foldLeft(df)((d, c) => d.withColumn(c,
      sha2(concat_ws("|", lit(salt), col(c).cast("string")), 256)))

  /** Per-document bigram stream (w1, w2) from the normalized word
    * array — a narrow map + explode, no shuffle; documents with < 2
    * tokens emit nothing. */
  def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = TextFunctions.normalizedWords(col(textCol))
    graft.sources.Balance.cpuBound(docs).select(col(idCol), w.as("w"))
      .filter(size(col("w")) >= 2)
      .select(col(idCol), explode(zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (x, y) => struct(x.as("w1"), y.as("w2")))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
  }

  /** Corpus-trained bigram language-model scoring — the CCNet-style
    * statistical quality signal (a doc whose bigrams are improbable
    * under the corpus LM is boilerplate, gibberish, or the wrong
    * register; docs score HIGH nll when surprising). Self-scored
    * add-one model: P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V) with context
    * counts from the bigram stream and V the unigram vocabulary.
    *
    * Determinism contract: each bigram's ln P is floor-scaled to an
    * exact INTEGER of 1e-6 units before the per-doc sum, so the
    * aggregation is order-independent (exact integer adds) and the
    * DuckDB oracle reproduces every doc's nll bit-for-bit — a raw
    * double sum would depend on Spark's partition-visit order.
    *
    * 100 TB shape: count relations derive from one bigram stream
    * (tokenize once), the scoring join is an equi-join on the bigram
    * key (hash-partitionable; counts tables are corpus-vocabulary-
    * sized, so they shuffle rather than broadcast at scale), and the
    * per-doc reduce is a map-side-combinable integer sum. */
  def lmNllScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val big = bigrams(docs, idCol, textCol)
    val cb = big.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val cw = big.groupBy("w1").agg(count(lit(1)).as("cw"))
    val v = docs.select(explode(TextFunctions.normalizedWords(col(textCol))).as("word"))
      .agg(countDistinct(col("word")).as("v"))
    big
      .join(cb, Seq("w1", "w2"))
      .join(cw, Seq("w1"))
      .crossJoin(broadcast(v))
      .withColumn("lp6", floor(log((col("cb") + 1).cast("double")
        / (col("cw") + col("v")).cast("double")) * 1e6 + 0.5))
      .groupBy(idCol)
      .agg(sum(col("lp6")).as("sum_lp6"), count(lit(1)).as("n_bigrams"))
      .select(col(idCol), col("n_bigrams"),
        TextFunctions.round4(-col("sum_lp6").cast("double") / 1e6
          / col("n_bigrams").cast("double")).as("nll"))
  }

  /** PII patterns, ordered as they are scrubbed (emails before URLs —
    * neither can contain the other under these charsets — then phones,
    * then bare IPv4s, so an address inside an already-redacted span is
    * never double-REDACTED; the n_* counts are raw-text match counts
    * per kind, so a span matching two kinds — an IPv4 host inside a
    * URL — counts once in each). Restricted to regex syntax that Java regex
    * (Spark) and RE2 (DuckDB) interpret identically: explicit character
    * classes, bounded repetition, no lookaround, no `\S`/`\w`
    * shorthand — the SQL oracle interpolates these exact strings. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""",
    "url"   -> """https?://[A-Za-z0-9./_-]+""",
    "phone" -> """\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}""",
    "ipv4"  -> """[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}""")

  /** Fixed-size token chunking with overlap — the context-window
    * splitting stage of a training-data pipeline (each document becomes
    * ceil((n_tok - chunkSize)/stride) + 1 chunks; the last chunk may be
    * short; empty/null documents produce no chunks). A narrow per-row
    * map followed by one explode over the bounded chunk-index sequence —
    * no shuffle, no join; output size is input tokens × (chunkSize /
    * stride) and scales with the scan. Chunk text is returned as an md5
    * digest (the downstream join key for dedup-after-chunking) plus the
    * actual token count, so rows stay narrow even for large chunks. */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val w = TextFunctions.normalizedWords(col(textCol))
    // ceil((n - chunkSize) / stride) via floor((n - chunkSize + stride - 1) /
    // stride); docs with n <= chunkSize get exactly one chunk (index 0)
    val lastIdx = floor((greatest(col("n") - chunkSize, lit(0)) + (stride - 1))
      .cast("double") / stride)
    // tokenize + per-chunk md5 is CPU-bound narrow work: a small parquet
    // input's 1-2 scan splits would pin it to as many cores
    graft.sources.Balance.cpuBound(docs).select(col(idCol), w.as("w"))
      .select(col(idCol), col("w"), size(col("w")).as("n"))
      // empty (and null-text) docs emit no chunks; the filter also keeps
      // the sequence() below well-formed (start <= stop)
      .filter(col("n") > 0)
      .select(col(idCol), col("w"), col("n"),
        explode(sequence(lit(0), lastIdx.cast("int"))).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        least(lit(chunkSize), col("n") - col("chunk_idx") * stride).cast("int").as("chunk_tok"),
        md5(concat_ws(" ", slice(col("w"), col("chunk_idx") * stride + 1, lit(chunkSize))))
          .as("chunk_hash"))
  }

  /** URL → registrable-domain extraction over documents: every URL in
    * the text (pattern shared with [[piiPatterns]] so the oracle
    * interpolates the same regex) exploded to (id, url, domain) rows.
    * Narrow map + explode, no shuffle — callers aggregate or blocklist-
    * join downstream. */
  def extractDomains(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val urlPat = piiPatterns.toMap.apply("url")
    graft.sources.Balance.cpuBound(docs).select(col(idCol),
        explode(regexp_extract_all(col(textCol), lit(urlPat), lit(0))).as("url"))
      .select(col(idCol), col("url"),
        regexp_extract(col("url"), "https?://([A-Za-z0-9.-]+)", 1).as("domain"))
  }

  /** Compression-ratio quality signal (Gopher-style): DEFLATE size over
    * UTF-8 size per document ([[graft.plans.CompressionExprs]] — a real
    * zlib codec, per-thread stream reuse, narrow map, no shuffle).
    * Boilerplate/repetitive text lands far below natural language;
    * `flag_repetitive` marks documents under `flagBelow` — long natural
    * prose deflates to roughly 0.3–0.45, template spam to well under
    * 0.1, so the default cut sits between the two regimes. Empty and
    * null texts yield a null ratio (no evidence either way). */
  def compressionQuality(docs: DataFrame, idCol: String, textCol: String,
      flagBelow: Double = 0.2): DataFrame = {
    val rawLen = octet_length(col(textCol))
    val ratio = when(rawLen > 0,
      graft.plans.CompressionExprs.deflateSize(col(textCol)).cast("double") / rawLen)
    graft.sources.Balance.cpuBound(docs)
      .select(col(idCol), rawLen.as("n_bytes"),
        TextFunctions.round4(ratio).as("deflate_ratio"))
      .withColumn("flag_repetitive",
        coalesce(col("deflate_ratio") < flagBelow, lit(false)))
  }

  /** Fixed-point log2 table for [[charEntropy]]: log2(k)·1e9 rounded,
    * k = 1..512. ONE Scala-computed literal emitted to both engines, so
    * the entropy arithmetic downstream of it is exact-integer and
    * hash-checks bit-for-bit. */
  val log2UnitsTable: Seq[Long] =
    (1 to 512).map(k => math.round(math.log(k) / math.log(2) * 1e9))

  /** The same table as a DuckDB list literal (1-based indexing `[k]`
    * matches Spark's 1-based `element_at`). */
  def log2UnitsTableSql: String = log2UnitsTable.mkString("[", ", ", "]")

  /** Character-entropy quality signal: Shannon entropy (bits/char) of
    * the character distribution over the first `prefix` characters —
    * the cheap "is this text or key-mash/template spam" screen (natural
    * prose sits near 4 bits, single-char runs at 0, base64 blobs near
    * 6). Bounding to a prefix is what makes the computation EXACT: all
    * counts land in [1, prefix], so
    *   H·L·1e9 = L·T[L] − Σ_c cnt_c·T[cnt_c]
    * is pure BIGINT over the shared [[log2UnitsTable]] — no
    * transcendentals at query time, and the low-entropy FLAG is an
    * all-integer comparison (H < 2 bits ⇔ hnum < 2·L·1e9). One float
    * division at the end under round4.
    *
    * Scale shape: narrow per-row map — ONE native code-point walk per
    * document ([[graft.plans.CharEntropyExpr]]; the composed
    * split/distinct/filter-count formulation was an interpreted
    * O(distinct·prefix) lambda per row, measured 17.8 s → kernel at
    * 500 k docs, see BENCH_NEWOPS_r09), no shuffle — scales with the
    * scan like the other per-row quality signals. Null text → null
    * signal; empty text → len_used 0, null entropy.
    */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String,
      prefix: Int = 512): DataFrame = {
    require(prefix >= 1 && prefix <= log2UnitsTable.size,
      s"prefix must be in [1, ${log2UnitsTable.size}], got $prefix")
    def nn(c: Column) = when(col(textCol).isNull, lit(null)).otherwise(c)
    graft.sources.Balance.cpuBound(docs)
      .select(col(idCol), col(textCol),
        graft.plans.CharEntropyExpr.charEntropyStats(col(textCol), prefix).as("_st"))
      .select(col(idCol),
        nn(col("_st.len_used")).as("len_used"),
        nn(col("_st.n_distinct")).as("n_distinct"),
        when(col("_st.len_used") > 0L, TextFunctions.round4(
          col("_st.hnum").cast("double") / (col("_st.len_used").cast("double") * 1e9)))
          .as("entropy"),
        nn(coalesce(col("_st.hnum") < lit(2000000000L) * col("_st.len_used")
          && col("_st.len_used") > 0L, lit(false))).as("flag_low_entropy"))
  }

  /** Per-domain KL divergence KL(P_domain ‖ P_corpus) over unigram
    * distributions — the data-mixing diagnostic (how far each
    * language/source/epoch drifts from the corpus-level token
    * distribution; the quantity mixture-reweighting methods like
    * DoReMi steer on). Per-(domain, word) contribution
    * p·ln(p/q) (p = c_dw/N_d, q = c_w/N) is quantized to 1e-6 units
    * per TERM — [[lmNllScore]]'s `lp6` idiom — so the per-domain sum
    * is an exact BIGINT total; ln's 1-ulp JVM-vs-libm risk is the same
    * accepted residual as q48/q91, validated on the gate fixtures.
    * q > 0 always (every domain word is a corpus word), so the log is
    * total.
    *
    * Plan shape: tokenize once; (domain, word) counts are ONE hash
    * aggregation; the corpus marginals derive from those counts (no
    * second corpus scan); joins are hash equi-joins on word/domain
    * plus a 1-row total attachment. Everything combines map-side —
    * the 100 TB cost is the one tokenize + one (domain, word)
    * shuffle. */
  def domainKl(docs: DataFrame, domainCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(domainCol).as("dom"),
      explode(TextFunctions.normalizedWords(col(textCol))).as("word"))
    val cDw = tok.groupBy("dom", "word").agg(count(lit(1)).as("c_dw"))
    val nD = cDw.groupBy("dom")
      .agg(sum("c_dw").as("n_tokens"), count(lit(1)).as("n_types"))
    val cW = cDw.groupBy("word").agg(sum("c_dw").as("c_w"))
    val n = cW.agg(sum("c_w").as("n"))
    val p = col("c_dw").cast("double") / col("n_tokens").cast("double")
    val q = col("c_w").cast("double") / col("n").cast("double")
    val kl6 = cDw
      .join(cW, Seq("word"))
      .join(nD.select("dom", "n_tokens"), Seq("dom"))
      .crossJoin(broadcast(n))
      .withColumn("t6", floor(p * log(p / q) * 1e6 + 0.5).cast("long"))
      .groupBy("dom").agg(sum("t6").as("kl6"))
    nD.join(kl6, Seq("dom"))
      .select(col("dom").as(domainCol), col("n_tokens"), col("n_types"),
        TextFunctions.round4(col("kl6").cast("double") / 1e6).as("kl"))
  }

  /** PII scrubbing — the redaction stage of a training-data pipeline:
    * emails, URLs, phone numbers, and IPv4 addresses are replaced with
    * `<EMAIL>`/`<URL>`/`<PHONE>`/`<IPV4>` placeholders, with per-kind
    * match counts (counted on the original text). A narrow per-row map —
    * codegen'd `regexp_replace`/`regexp_extract_all`, no shuffle, scales
    * with the scan. */
  def scrubPii(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = piiPatterns.map { case (kind, p) =>
      size(regexp_extract_all(col(textCol), lit(p), lit(0))).as(s"n_$kind")
    }
    val scrubbed = piiPatterns.foldLeft(col(textCol)) { case (c, (kind, p)) =>
      regexp_replace(c, lit(p), lit(s"<${kind.toUpperCase(java.util.Locale.ROOT)}>"))
    }
    graft.sources.Balance.cpuBound(docs)
      .select(col(idCol) +: counts :+ scrubbed.as("clean_text"): _*)
  }

  /** 16-digit candidate pattern for [[luhnScreen]] — shared with the
    * oracle verbatim. */
  val ccCandidatePat = "[0-9]{16}"

  /** Luhn checksum validity of a 16-digit string column: from the
    * LEFT of a 16-length string, digits at odd 1-based positions
    * double (9-fold back), sum ≡ 0 (mod 10). Pure integer HOF
    * arithmetic — identical literals both engines. */
  def luhnValid16(c: Column): Column = {
    val s = aggregate(sequence(lit(1), lit(16)), lit(0), (acc, i) => {
      val d = substring(c, i.cast("int"), lit(1)).cast("int")
      acc + when(i % 2 === 1,
        when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
    })
    pmod(s, lit(10)) === 0
  }

  /** SQL twin of [[luhnValid16]] over a VARCHAR expression. */
  def luhnValid16Sql(expr: String): String =
    s"list_sum(list_transform(range(1, 17), i -> CASE WHEN i % 2 = 1 " +
      s"THEN CASE WHEN 2 * CAST(substr($expr, CAST(i AS INT), 1) AS INT) > 9 " +
      s"THEN 2 * CAST(substr($expr, CAST(i AS INT), 1) AS INT) - 9 " +
      s"ELSE 2 * CAST(substr($expr, CAST(i AS INT), 1) AS INT) END " +
      s"ELSE CAST(substr($expr, CAST(i AS INT), 1) AS INT) END)) % 10 = 0"

  /** CREDIT-CARD SCREEN with Luhn validation — the PII detector q68's
    * regex battery cannot be trusted with: a bare 16-digit regex
    * flags order numbers and hashes alongside real PANs; the Luhn
    * checksum (ISO/IEC 7812) rejects ~90% of random digit runs, which
    * is the difference between a usable redaction queue and noise.
    * Per doc: candidate count, Luhn-valid count, and the valid digit
    * runs themselves (sorted, joined) for the redaction stage.
    * Narrow per-row regex + integer HOFs — zero exchanges. */
  def luhnScreen(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cands = regexp_extract_all(col(textCol), lit(ccCandidatePat), lit(0))
    graft.sources.Balance.cpuBound(docs)
      .select(col(idCol), cands.as("__c"))
      .select(col(idCol),
        size(col("__c")).cast("long").as("n_candidates"),
        filter(col("__c"), c => luhnValid16(c)).as("__v"))
      .select(col(idCol), col("n_candidates"),
        size(col("__v")).cast("long").as("n_valid"),
        array_join(array_sort(col("__v")), " ").as("valid_pans"))
  }

  /** Code-ish symbol class and keyword alternation for
    * [[codeSignals]] — shared with the oracle verbatim (RE2 ∩ Java:
    * `\b` boundaries and character classes only). */
  val codeSymPat = "[{}\\[\\]();=<>*&|+%/]"
  val codeKwPat = "\\b(def|return|import|function|var|const|class)\\b"

  /** CODE/MARKUP CONTENT DETECTION — the router gate in front of a
    * text-only curation chain: natural-language quality rules (q31,
    * q177) mis-score source code, so pipelines first split code out
    * (to its own pipeline) by cheap surface signals: code-symbol
    * density and reserved-keyword hits. Both are single-regex counts;
    * the gate is deterministic integer arithmetic. Narrow per-row
    * projection — zero exchanges. */
  def codeSignals(docs: DataFrame, idCol: String, textCol: String,
      minKw: Int = 2, minSym: Int = 8): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    graft.sources.Balance.cpuBound(docs)
      .select(col(idCol),
        size(regexp_extract_all(t, lit(codeSymPat), lit(0))).cast("long").as("n_sym"),
        size(regexp_extract_all(t, lit(codeKwPat), lit(0))).cast("long").as("n_kw"))
      .withColumn("is_code", col("n_kw") >= minKw && col("n_sym") >= minSym)
  }

  // ---- encoding-damage (mojibake) screening --------------------------

  /** Double-encoded UTF-8 signature pattern (shared with oracles
    * verbatim): UTF-8 bytes of a common accented Latin-1 char
    * re-decoded as Latin-1/cp1252 and re-encoded — `é`→`Ã©`,
    * `’`→`â€™` etc., the classic mojibake a mixed-encoding crawl
    * produces. Spelled as two signature families: `Ã` + a Latin-1
    * accent tail, and `â€` + a cp1252 punctuation tail. */
  val doubleEncPat: String =
    "Ã[§¨©±¶¼]|â€[œ’“™]"

  /** The U+FFFD replacement character a lossy transcode leaves behind. */
  val replacementPat: String = "�"

  /** Stray C1 control characters (U+0080–U+009F) — the Latin-1/cp1252
    * confusion band; hex-escape spelling is the RE2 ∩ Java dialect, so
    * the identical pattern TEXT runs in both engines. */
  val c1Pat: String = "[\\x{0080}-\\x{009F}]"

  /** ENCODING-DAMAGE SCREEN: per-doc counts of the three mojibake
    * signatures above plus the aggregate verdict — the curation gate
    * that catches transcoding damage BEFORE it poisons tokenizer
    * training (a double-encoded corpus teaches the BPE learner `Ã©`
    * merges) or dedup (damaged and clean copies of one page hash
    * apart). Heuristic by design — signature families, not a full
    * chardet — so the whole gate stays oracle-expressible and runs as
    * a pure narrow projection: three codegen'd regex counts per row,
    * ZERO exchanges at any corpus size. */
  def encodingDamage(docs: DataFrame, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    graft.sources.Balance.cpuBound(docs)
      .withColumn("n_double_enc",
        size(regexp_extract_all(t, lit(doubleEncPat), lit(0))).cast("long"))
      .withColumn("n_replacement",
        size(regexp_extract_all(t, lit(replacementPat), lit(0))).cast("long"))
      .withColumn("n_c1",
        size(regexp_extract_all(t, lit(c1Pat), lit(0))).cast("long"))
      .withColumn("is_damaged",
        col("n_double_enc") + col("n_replacement") + col("n_c1") > 0)
  }
}
