package graft.sources

/** SQL hook-file support (reference `hooks.go`): the reference's only
  * user-extension point — SQL files executed at four pipeline phases
  * (`before_data`, `after_data`, `before_fk`, `after_all`,
  * `config.go:58-63`) with `{{schema}}` substitution (`hooks.go:27`).
  */
object Hooks {

  /** F22 — template substitution. */
  def substituteSchema(sql: String, schema: String): String =
    sql.replace("{{schema}}", schema)

  /** F21 — split a SQL script into statements on `;`, respecting single
    * and double quotes, `--` line comments, nested C-style comments, and
    * `$tag$ … $tag$` dollar quoting (reference `hooks.go:42-188`).
    */
  def splitStatements(script: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    val n = script.length
    var inSingle = false
    var inDouble = false
    var inLineComment = false
    var blockDepth = 0
    var dollarTag: Option[String] = None

    def dollarTagAt(pos: Int): Option[String] = {
      if (script.charAt(pos) != '$') return None
      var j = pos + 1
      while (j < n && (script.charAt(j).isLetterOrDigit ||
        script.charAt(j) == '_')) j += 1
      if (j < n && script.charAt(j) == '$') Some(script.substring(pos, j + 1))
      else None
    }

    while (i < n) {
      val c = script.charAt(i)
      if (inLineComment) {
        cur.append(c)
        if (c == '\n') inLineComment = false
        i += 1
      } else if (blockDepth > 0) {
        if (c == '*' && i + 1 < n && script.charAt(i + 1) == '/') {
          blockDepth -= 1; cur.append("*/"); i += 2
        } else if (c == '/' && i + 1 < n && script.charAt(i + 1) == '*') {
          blockDepth += 1; cur.append("/*"); i += 2
        } else { cur.append(c); i += 1 }
      } else if (dollarTag.isDefined) {
        val tag = dollarTag.get
        if (c == '$' && script.regionMatches(i, tag, 0, tag.length)) {
          cur.append(tag); i += tag.length; dollarTag = None
        } else { cur.append(c); i += 1 }
      } else if (inSingle) {
        cur.append(c)
        if (c == '\'' && !(i + 1 < n && script.charAt(i + 1) == '\'')) {
          inSingle = false
        } else if (c == '\'') { cur.append('\''); i += 1 }
        i += 1
      } else if (inDouble) {
        cur.append(c)
        if (c == '"') inDouble = false
        i += 1
      } else c match {
        case '\'' => inSingle = true; cur.append(c); i += 1
        case '"' => inDouble = true; cur.append(c); i += 1
        case '-' if i + 1 < n && script.charAt(i + 1) == '-' =>
          inLineComment = true; cur.append("--"); i += 2
        case '/' if i + 1 < n && script.charAt(i + 1) == '*' =>
          blockDepth = 1; cur.append("/*"); i += 2
        case '$' =>
          dollarTagAt(i) match {
            case Some(tag) => dollarTag = Some(tag); cur.append(tag); i += tag.length
            case None => cur.append(c); i += 1
          }
        case ';' =>
          val stmt = cur.toString.trim
          if (stmt.nonEmpty) out += stmt
          cur.clear(); i += 1
        case other => cur.append(other); i += 1
      }
    }
    val last = cur.toString.trim
    if (last.nonEmpty) out += last
    out.result()
  }

  /** A statement is executable if it isn't only comments/whitespace. */
  def isExecutable(stmt: String): Boolean = {
    val noBlock = "(?s)/\\*.*?\\*/".r.replaceAllIn(stmt, "")
    noBlock.linesIterator
      .map(_.trim).exists(l => l.nonEmpty && !l.startsWith("--"))
  }
}
