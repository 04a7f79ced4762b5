package graft.sources

/** Collation compatibility analysis (reference `collation_compat.go`).
  *
  * Case-insensitive (`_ci`) source collations change comparison/unique
  * semantics on PostgreSQL: optionally map them to `citext`
  * (`collation_compat.go:28-42`); binary (`_bin`) collations map to
  * `COLLATE "C"` (`collation_compat.go:147-150`). Unique indexes over
  * `_ci` columns that are NOT becoming citext get a warning — their
  * uniqueness semantics tighten on the target
  * (`collation_compat.go:48-125`).
  */
object CollationCompat {

  sealed trait Treatment
  case object NoChange extends Treatment
  case object ToCitext extends Treatment
  case object ToCollateC extends Treatment

  def isCaseInsensitive(collation: String): Boolean =
    collation.toLowerCase.endsWith("_ci")

  def isBinary(collation: String): Boolean =
    collation.toLowerCase.endsWith("_bin")

  def treatment(c: SourceColumn, ciAsCitext: Boolean): Treatment =
    if (c.collation.isEmpty) NoChange
    else if (isCaseInsensitive(c.collation) && ciAsCitext) ToCitext
    else if (isBinary(c.collation)) ToCollateC
    else NoChange

  /** Rewrite the PG column type for the collation treatment. */
  def applyTreatment(pgType: String, t: Treatment): String = t match {
    case NoChange => pgType
    case ToCitext => "citext"
    case ToCollateC => s"$pgType COLLATE \"C\""
  }

  /** Text-like PG types that accept a COLLATE clause
    * (`collation_compat.go:158-171` — citext intentionally excluded).
    */
  def isTextLikePgType(pgType: String): Boolean = {
    val l = pgType.toLowerCase
    l == "text" || l.startsWith("varchar") || l.startsWith("char")
  }

  /** The full config-driven column policy used at DDL time, composing
    * `pgTypeForCollation` (`collation_compat.go:28-42`) with
    * `pgCollationClause` (`collation_compat.go:127-155`):
    * citext promotion for unmapped `_ci` columns under `ci_as_citext`,
    * then under `collation_mode = auto` a COLLATE clause — the
    * user's `collation_map` entry first, `"C"` for `_bin`, nothing
    * otherwise (warnings cover the rest).
    */
  def applyConfigPolicy(c: SourceColumn, pgType: String,
      o: TypeOptions): String = {
    val promoted =
      if (o.ciAsCitext && isCaseInsensitive(c.collation) &&
          !o.collationMap.contains(c.collation) &&
          isTextLikePgType(pgType)) "citext"
      else pgType
    val clause =
      if (o.collationMode != "auto" || c.collation.isEmpty ||
          !isTextLikePgType(promoted)) ""
      else o.collationMap.get(c.collation) match {
        case Some(mapped) => s""" COLLATE "$mapped""""
        case None if o.ciAsCitext && isCaseInsensitive(c.collation) => ""
        case None if isBinary(c.collation) => " COLLATE \"C\""
        case None => ""
      }
    promoted + clause
  }

  final case class CollationWarning(table: String, index: String,
      columns: Seq[String], reason: String)

  /** Unique indexes whose member columns are `_ci` but stay plain text:
    * values equal under the source's CI collation become distinct on PG,
    * so rows that collided at the source now both insert — and rows the
    * source accepted may collide if citext is chosen later.
    */
  def uniqueIndexWarnings(table: String, cols: Seq[SourceColumn],
      indexes: Seq[IndexMeta], ciAsCitext: Boolean): Seq[CollationWarning] = {
    val ciCols = cols.filter(c => isCaseInsensitive(c.collation))
      .map(_.name).toSet
    if (ciAsCitext || ciCols.isEmpty) Nil
    else indexes.filter(ix => ix.unique &&
      ix.columns.exists(ciCols.contains)).map { ix =>
      CollationWarning(table, ix.name,
        ix.columns.filter(ciCols.contains),
        "unique index over case-insensitive column(s): uniqueness " +
          "semantics change on PostgreSQL (consider citext)")
    }
  }

  /** Distinct collations in a schema (reference
    * `collation_compat.go:53-104` distinct-set collection).
    */
  def distinctCollations(tables: Seq[(String, Seq[SourceColumn])])
      : Seq[String] =
    tables.flatMap(_._2).map(_.collation).filter(_.nonEmpty)
      .distinct.sorted
}
