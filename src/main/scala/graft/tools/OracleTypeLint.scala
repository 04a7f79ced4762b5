package graft.tools

/** Static lint for the HUGEINT oracle-typing trap (the r16 defect
  * class: five red CORRECTNESS rows from ONE cause).
  *
  * DuckDB's `SUM` over integer input yields HUGEINT, which surfaces
  * over Arrow as `decimal128(38,0)`; Spark's `sum(long)` stays int64.
  * The driver's hasher serializes values WITH types, so an oracle
  * whose final SELECT exposes a SUM-derived integer column without a
  * `CAST(... AS BIGINT)` hash-mismatches even when every value is
  * identical (`Relational.scala` documents the rule; r16 shipped five
  * oracles that missed it). This lint finds that statically, so the
  * class fails `sbt test` instead of shipping to the driver gate.
  *
  * Method: per oracle SQL, compute the set of HUGEINT-"tainted"
  * select aliases — an expression is tainted when (after masking
  * every `CAST(...)` region, which pins its own output type) it still
  * contains a `SUM(` call or a reference to a tainted upstream alias.
  * Taint propagates through CTEs in definition order. The caller then
  * reports only final-SELECT columns that are BOTH tainted and
  * integral on the Spark side (a SUM over DOUBLE stays double in both
  * engines, so Spark's output schema is the ground truth for which
  * sums are the integer kind).
  */
object OracleTypeLint {

  /** Mask string-literal contents AND strip `--` comments in ONE
    * scanner pass. Neither is safe as a separate phase: a `--` inside
    * a literal (a concat separator) would truncate the line if
    * comments were stripped first, and an apostrophe inside a comment
    * ("r16's") would flip the literal state machine if literals were
    * masked first. Here a `--` only opens a comment OUTSIDE a literal,
    * and a quote only toggles the literal state OUTSIDE a comment.
    */
  private def maskLiteralsAndComments(sql: String): String = {
    val sb = new StringBuilder(sql.length)
    var i = 0
    var inStr = false
    var inComment = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\n') { inComment = false; sb.append('\n') }
      else if (inComment) () // dropped
      else if (inStr) {
        if (c == '\'') { inStr = false; sb.append('\'') }
        else sb.append(' ')
      } else if (c == '\'') { inStr = true; sb.append('\'') }
      else if (c == '-' && i + 1 < sql.length &&
          sql.charAt(i + 1) == '-') { inComment = true }
      else sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** Replace every balanced `CAST(...)` / `TRY_CAST(...)` region with
    * a neutral literal — a CAST's output type is pinned regardless of
    * what it wraps, so nothing inside can taint the enclosing
    * expression.
    */
  private[tools] def maskCasts(sql: String): String = {
    val re = "(?i)\\b(?:TRY_)?CAST\\s*\\(".r
    var s = sql
    var m = re.findFirstMatchIn(s)
    while (m.isDefined) {
      val open = s.indexOf('(', m.get.start)
      var depth = 1
      var j = open + 1
      while (depth > 0 && j < s.length) {
        s.charAt(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
        }
        j += 1
      }
      s = s.substring(0, m.get.start) + " 0 " + s.substring(j)
      m = re.findFirstMatchIn(s)
    }
    s
  }

  /** Split `body` on top-level (paren-depth-0) occurrences of `sep`
    * (a single char).
    */
  private def splitTop(body: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < body.length) {
      body.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case c if c == sep && depth == 0 =>
          out += body.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += body.substring(start)
    out.result()
  }

  /** Index of first depth-0 match of word `kw` at/after `from`, or -1. */
  private def topIndexOf(s: String, kw: String, from: Int): Int = {
    val re = s"(?i)\\b$kw\\b".r
    var depth = 0
    var i = 0
    var hit = -1
    while (i < s.length && hit < 0) {
      s.charAt(i) match {
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case _ =>
          if (depth == 0 && i >= from &&
              re.findPrefixMatchOf(s.substring(i)).isDefined &&
              (i == 0 || !s.charAt(i - 1).isLetterOrDigit))
            hit = i
          i += 1
      }
    }
    hit
  }

  /** (alias, exprText) per item of every depth-0 SELECT list in
    * `body` (UNION branches each contribute one list).
    */
  private[tools] def selectItems(body: String): Seq[(Option[String], String)] = {
    val items = Seq.newBuilder[(Option[String], String)]
    var pos = 0
    var sel = topIndexOf(body, "SELECT", pos)
    while (sel >= 0) {
      var start = sel + "SELECT".length
      val rest = body.substring(start)
      val mod = "(?i)^\\s*(DISTINCT|ALL)\\b".r.findFirstMatchIn(rest)
      if (mod.isDefined) start += mod.get.end
      val end0 = topIndexOf(body, "FROM", start)
      val end = if (end0 >= 0) end0 else body.length
      splitTop(body.substring(start, end), ',').map(_.trim)
        .filter(_.nonEmpty).foreach { item =>
          val as = "(?is)\\s+AS\\s+\"?([A-Za-z_][A-Za-z0-9_]*)\"?\\s*$"
            .r.findFirstMatchIn(item)
          val alias: Option[String] = as match {
            case Some(m) => Some(m.group(1).toLowerCase)
            case None =>
              if (item.matches("(?s)^[A-Za-z_][A-Za-z0-9_.]*$"))
                Some(item.split('.').last.toLowerCase)
              else None
          }
          val expr = as.map(m => item.substring(0, m.start))
            .getOrElse(item)
          items += alias -> expr
        }
      pos = end + 1
      sel = topIndexOf(body, "SELECT", pos)
    }
    items.result()
  }

  /** Parse `WITH a AS (...), b AS (...) <final>` into the ordered CTE
    * list plus the final query text. No-WITH queries return an empty
    * CTE list.
    */
  private[tools] def splitCtes(sql: String): (Seq[(String, String)], String) = {
    val m = "(?i)^\\s*WITH\\s+(RECURSIVE\\s+)?".r.findFirstMatchIn(sql)
    if (m.isEmpty) return (Nil, sql)
    val ctes = Seq.newBuilder[(String, String)]
    var i = m.get.end
    var done = false
    while (!done) {
      val nm = "(?s)^\\s*\"?([A-Za-z_][A-Za-z0-9_]*)\"?\\s*(\\([^)]*\\))?\\s*AS\\s*\\("
        .r.findFirstMatchIn(sql.substring(i))
      nm match {
        case None => done = true
        case Some(h) =>
          val open = i + h.end - 1
          var depth = 1
          var j = open + 1
          while (depth > 0 && j < sql.length) {
            sql.charAt(j) match {
              case '(' => depth += 1
              case ')' => depth -= 1
              case _ =>
            }
            j += 1
          }
          ctes += h.group(1).toLowerCase -> sql.substring(open + 1, j - 1)
          i = j
          val comma = "(?s)^\\s*,".r.findFirstMatchIn(sql.substring(i))
          if (comma.isDefined) i += comma.get.end else done = true
      }
    }
    (ctes.result(), sql.substring(i))
  }

  private def tainted(expr: String, taint: Set[String]): Boolean = {
    val e = maskCasts(expr)
    "(?i)\\bSUM\\s*\\(".r.findFirstIn(e).isDefined ||
      taint.exists(t => s"(?i)\\b$t\\b".r.findFirstIn(e).isDefined)
  }

  /** Final-SELECT aliases whose oracle expression is HUGEINT-tainted.
    * Cross against the Spark output schema's integral columns to get
    * actual defects.
    */
  def taintedOutputs(sql: String): Set[String] = {
    val clean = maskLiteralsAndComments(sql)
    val (ctes, fin) = splitCtes(clean)
    var taint = Set.empty[String]
    ctes.foreach { case (_, body) =>
      selectItems(body).foreach { case (alias, expr) =>
        if (tainted(expr, taint)) alias.foreach(a => taint += a)
      }
    }
    selectItems(fin).collect {
      case (Some(a), expr) if tainted(expr, taint) => a
    }.toSet
  }
}
