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
