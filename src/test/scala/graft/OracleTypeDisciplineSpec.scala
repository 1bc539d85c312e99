package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static oracle type-discipline gate (round-12 verdict task 2).
  *
  * Background: DuckDB's window `sum(<integer>)` returns HUGEINT (int128).
  * A HUGEINT-derived column reaching an oracle's final SELECT uncast hashes
  * differently on a driver whose DuckDB/Arrow version dtypes int128
  * differently from the local replay — rows/schema green, hash red, immune
  * to renaming. That exact hole kept the q169 family driver-red for four
  * rounds (r8–r11) before the r11 judge isolated it.
  *
  * This spec closes the CLASS statically, in-JVM, on every `sbt test`:
  * it scans every oracle in [[SparkEntry.oracleSql]] for window-`sum`
  * aliases and taint-tracks them through CTE select lists to the final
  * SELECT. A tainted identifier may only reach an output item through a
  * laundering context — `CAST(...)` (explicit type), `OVER (...)` (used
  * as a window key, not a value), float division `/` (DuckDB `/` is
  * DOUBLE), or a boolean context (comparison operator / `WHEN cond THEN`)
  * — otherwise the spec fails with the query name and offending item.
  *
  * The authoritative SEMANTIC audit (DuckDB's own typer via `DESCRIBE`)
  * is `tools/oracle_type_audit.py`, run per round against the dumped
  * oracle_sql.json; this spec is the always-on static complement.
  */
class OracleTypeDisciplineSpec extends AnyFunSuite {
  import OracleTypeCheck._

  test("no window-sum-derived oracle column reaches the final SELECT uncast") {
    val violations = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) => check(sql).map(v => s"$name: $v")
    }
    assert(violations.isEmpty, violations.mkString("\n", "\n", ""))
  }

  test("the checker flags the pre-fix q169 spelling (planted regression)") {
    // The exact shape that was driver-red r8–r11: `cum` from a window sum,
    // `(cum - n_tok) // 4096` uncast through CTE `g` to the final SELECT.
    val preFix =
      """WITH d AS (
        |  SELECT doc_id, CAST(n AS BIGINT) AS n_tok FROM t
        |), b AS (
        |  SELECT doc_id, n_tok, n_tok // 64 AS bucket,
        |         sum(n_tok) OVER (PARTITION BY n_tok // 64
        |           ORDER BY n_tok, doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM d
        |), g AS (
        |  SELECT bucket, (cum - n_tok) // 4096 AS batch_idx, n_tok FROM b
        |)
        |SELECT bucket, batch_idx, CAST(count(*) AS BIGINT) AS n_docs
        |FROM g GROUP BY bucket, batch_idx
        |ORDER BY bucket, batch_idx""".stripMargin
    val vs = check(preFix)
    assert(vs.nonEmpty, "checker must flag the uncast HUGEINT-derived batch_idx")
    assert(vs.exists(_.contains("batch_idx")), vs.mkString("; "))
  }

  test("the checker passes the fixed q169 spelling") {
    val fixed =
      """WITH d AS (
        |  SELECT doc_id, CAST(n AS BIGINT) AS n_tok FROM t
        |), b AS (
        |  SELECT doc_id, n_tok, CAST(n_tok // 64 AS BIGINT) AS bucket,
        |         sum(n_tok) OVER (PARTITION BY n_tok // 64
        |           ORDER BY n_tok, doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM d
        |), g AS (
        |  SELECT bucket, CAST((cum - n_tok) // 4096 AS BIGINT) AS batch_idx,
        |         n_tok
        |  FROM b
        |)
        |SELECT bucket, batch_idx, CAST(count(*) AS BIGINT) AS n_docs
        |FROM g GROUP BY bucket, batch_idx
        |ORDER BY bucket, batch_idx""".stripMargin
    assert(check(fixed).isEmpty)
  }
}

/** The static checker. Operates on the raw SQL text: no full parser, but
  * paren-balanced scanning (not regex) for call/OVER groups, so nested
  * parens in arguments are handled. String literals are blanked first so
  * quoted text can't confuse the scan.
  */
private[graft] object OracleTypeCheck {

  /** Returns human-readable violations; empty = disciplined. */
  def check(rawSql: String): Seq[String] = {
    val sql = blankStrings(rawSql)
    val selects = selectSpans(sql)
    if (selects.isEmpty) return Nil
    // The final SELECT = the last span at paren depth 0.
    val finalSpan = selects.filter(_.depth == 0).lastOption
    var tainted = windowSumAliases(sql)
    val violations = Seq.newBuilder[String]
    // Single forward pass suffices (CTEs are defined before use); a second
    // pass catches any ordering oddity cheaply.
    (0 until 2).foreach { pass =>
      selects.foreach { span =>
        val isFinal = finalSpan.contains(span)
        items(sql, span).foreach { it =>
          val hit = tainted.find(a => referencesUnlaundered(sql, it, a))
          hit.foreach { a =>
            it.alias match {
              case Some(out) if !isFinal => tainted += out
              case _ if isFinal =>
                if (pass == 0)
                  violations += s"output item `${snippet(sql, it)}` carries " +
                    s"window-sum-derived `$a` uncast (DuckDB HUGEINT)"
              case _ => () // anonymous item in a subquery: unused downstream
            }
          }
        }
      }
    }
    violations.result().distinct
  }

  // ---------------------------------------------------------------- scan

  private final case class Span(start: Int, end: Int, depth: Int) // [start,end)
  private final case class Item(start: Int, end: Int, alias: Option[String])

  private def snippet(sql: String, it: Item): String = {
    val s = sql.substring(it.start, it.end).trim.replaceAll("\\s+", " ")
    if (s.length <= 60) s else s.take(57) + "..."
  }

  /** Blank the contents of single-quoted literals (keep length/offsets). */
  private def blankStrings(sql: String): String = {
    val b = sql.toCharArray
    var i = 0; var in = false
    while (i < b.length) {
      if (b(i) == '\'') in = !in
      else if (in) b(i) = ' '
      i += 1
    }
    new String(b)
  }

  private def isIdentChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  private def wordAt(sql: String, i: Int, w: String): Boolean =
    i + w.length <= sql.length &&
      sql.regionMatches(true, i, w, 0, w.length) &&
      (i == 0 || !isIdentChar(sql(i - 1))) &&
      (i + w.length == sql.length || !isIdentChar(sql(i + w.length)))

  private def skipWs(sql: String, i0: Int): Int = {
    var i = i0
    while (i < sql.length && sql(i).isWhitespace) i += 1
    i
  }

  /** Index just past the paren group opening at `open` (sql(open)=='('). */
  private def matchParen(sql: String, open: Int): Int = {
    var i = open; var d = 0
    while (i < sql.length) {
      if (sql(i) == '(') d += 1
      else if (sql(i) == ')') { d -= 1; if (d == 0) return i + 1 }
      i += 1
    }
    sql.length
  }

  /** Aliases bound to a window `sum(...) OVER (...) AS alias`, plus a
    * sentinel for anonymous window sums in select items (handled by the
    * laundering test at the seed site via referencesUnlaundered on the
    * alias-free item: an anonymous seed only matters if its ITEM is an
    * output, which the caller's taint loop covers through `__winsum__`).
    */
  private def windowSumAliases(sql: String): Set[String] = {
    var out = Set.empty[String]
    var i = 0
    while (i < sql.length) {
      if (wordAt(sql, i, "sum")) {
        val p = skipWs(sql, i + 3)
        if (p < sql.length && sql(p) == '(') {
          val afterArgs = matchParen(sql, p)
          val q = skipWs(sql, afterArgs)
          if (wordAt(sql, q, "over")) {
            val r = skipWs(sql, q + 4)
            if (r < sql.length && sql(r) == '(') {
              val afterOver = matchParen(sql, r)
              val s0 = skipWs(sql, afterOver)
              if (wordAt(sql, s0, "as")) {
                val s1 = skipWs(sql, s0 + 2)
                var s2 = s1
                while (s2 < sql.length && isIdentChar(sql(s2))) s2 += 1
                if (s2 > s1) {
                  // `CAST(sum(..) OVER (..) AS T)` is the cast's AS — an
                  // alias inside an enclosing CAST group is laundering,
                  // not a taint seed.
                  if (!insideGroup(sql, i, "cast")) out += sql.substring(s1, s2).toLowerCase
                }
              }
            }
          }
          i = afterArgs
        } else i += 3
      } else i += 1
    }
    out
  }

  /** All `SELECT ... FROM` spans (select-list region) with their paren
    * depth at the SELECT keyword. A SELECT without FROM at its own depth
    * ends at the enclosing close paren / end of text.
    */
  private def selectSpans(sql: String): Seq[Span] = {
    val out = Seq.newBuilder[Span]
    var i = 0; var depth = 0
    while (i < sql.length) {
      val c = sql(i)
      if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') { depth -= 1; i += 1 }
      else if (wordAt(sql, i, "select")) {
        val start = i + 6
        var j = start; var d = 0; var end = -1
        while (j < sql.length && end < 0) {
          val cj = sql(j)
          if (cj == '(') d += 1
          else if (cj == ')') { d -= 1; if (d < 0) end = j }
          else if (d == 0 && wordAt(sql, j, "from")) end = j
          j += 1
        }
        out += Span(start, if (end < 0) sql.length else end, depth)
        i = start
      } else i += 1
    }
    out.result()
  }

  /** Split a select-list span at top-level commas; extract trailing
    * `AS alias` / bare trailing identifier alias.
    */
  private def items(sql: String, span: Span): Seq[Item] = {
    val out = Seq.newBuilder[Item]
    var start = span.start; var i = span.start; var d = 0
    def close(endAt: Int): Unit = {
      if (endAt > start) {
        // trailing alias: `... AS name` (case-insensitive) at top level
        val text = sql.substring(start, endAt)
        val m = java.util.regex.Pattern
          .compile("(?is)\\bas\\s+([a-z_][a-z0-9_]*)\\s*$")
          .matcher(text)
        val alias = if (m.find()) Some(m.group(1).toLowerCase) else None
        out += Item(start, endAt, alias)
      }
      start = endAt + 1
    }
    while (i < span.end) {
      val c = sql(i)
      if (c == '(') d += 1
      else if (c == ')') d -= 1
      else if (c == ',' && d == 0) close(i)
      i += 1
    }
    close(span.end)
    out.result()
  }

  /** True iff position `pos` lies inside a `<kw> ( ... )` group. */
  private def insideGroup(sql: String, pos: Int, kw: String): Boolean = {
    var i = 0
    while (i < pos) {
      if (wordAt(sql, i, kw)) {
        val p = skipWs(sql, i + kw.length)
        if (p < sql.length && sql(p) == '(') {
          val end = matchParen(sql, p)
          if (pos > p && pos < end) return true
          i = p
        } else i += kw.length
      } else i += 1
    }
    false
  }

  /** Does item `it` reference tainted identifier `a` outside every
    * laundering context? Laundering contexts, per the corpus calibration:
    *  - inside `CAST ( ... )` — explicit output type;
    *  - inside `OVER ( ... )` — window key, not a value;
    *  - a float division `/` at the occurrence's paren depth within the
    *    item (DuckDB `/` yields DOUBLE; `//` does not launder);
    *  - a comparison operator at the occurrence's depth (boolean result);
    *  - between `WHEN` and `THEN` (boolean condition).
    */
  private def referencesUnlaundered(sql: String, it: Item, a: String): Boolean = {
    var i = it.start
    while (i < it.end) {
      if (wordAt(sql, i, a)) {
        if (!launders(sql, it, i)) return true
        i += a.length
      } else i += 1
    }
    false
  }

  private def launders(sql: String, it: Item, pos: Int): Boolean = {
    // CAST / OVER enclosure anywhere before pos in the whole text (the
    // group must contain pos).
    if (insideGroup(sql, pos, "cast") || insideGroup(sql, pos, "over")) return true
    // WHEN ... THEN condition context within the item.
    val upTo = sql.substring(it.start, pos)
    val after = sql.substring(pos, it.end)
    val lastWhen = upTo.toLowerCase.lastIndexOf("when")
    val lastThen = upTo.toLowerCase.lastIndexOf("then")
    if (lastWhen >= 0 && lastWhen > lastThen &&
        after.toLowerCase.contains("then")) return true
    // Float division or comparison at the occurrence's depth, scanning the
    // smallest enclosing region: the item at depth 0, or the innermost
    // paren group containing pos.
    val (lo, hi) = enclosingRegion(sql, it, pos)
    var i = lo; var d = 0
    while (i < hi) {
      val c = sql(i)
      if (c == '(') { d += 1; i += 1 }
      else if (c == ')') { d -= 1; i += 1 }
      else if (d == 0) {
        if (c == '/' && (i + 1 >= hi || sql(i + 1) != '/') &&
            (i == 0 || sql(i - 1) != '/')) return true
        if (c == '=' || c == '<' || c == '>') return true
        if (wordAt(sql, i, "in") || wordAt(sql, i, "is") ||
            wordAt(sql, i, "between")) return true
        i += 1
      } else i += 1
    }
    false
  }

  /** Innermost paren group inside the item containing `pos`, else the
    * whole item.
    */
  private def enclosingRegion(sql: String, it: Item, pos: Int): (Int, Int) = {
    var bestLo = it.start; var bestHi = it.end
    var i = it.start
    while (i < pos) {
      if (sql(i) == '(') {
        val end = matchParen(sql, i)
        if (pos > i && pos < end && i >= bestLo) { bestLo = i + 1; bestHi = end - 1 }
        if (end <= pos) i = end else i += 1
      } else i += 1
    }
    (bestLo, bestHi)
  }
}
