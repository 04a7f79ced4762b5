package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FK orphan detection and repair as distributed joins (reference
  * `post.go:482-538`): the reference emits
  * `DELETE FROM child WHERE (fk cols NOT NULL) AND NOT EXISTS (parent)`
  * per FK; here the same semantics are anti/semi joins over DataFrames.
  *
  * MATCH SIMPLE parity (reference `post.go:532-538`): a child row with
  * ANY NULL FK component is never an orphan — the null-guard predicate
  * excludes it from the anti-join's left side.
  */
object OrphanCleanup {

  private def joinCond(child: DataFrame, parent: DataFrame,
      fkCols: Seq[String], refCols: Seq[String]): Column =
    fkCols.zip(refCols)
      .map { case (f, r) => child(f) === parent(r) }
      .reduce(_ && _)

  private def allNotNull(child: DataFrame, fkCols: Seq[String]): Column =
    fkCols.map(child(_).isNotNull).reduce(_ && _)

  /** Child rows whose FK target is missing (candidates for DELETE /
    * SET NULL).
    */
  def findOrphans(child: DataFrame, parent: DataFrame,
      fkCols: Seq[String], refCols: Seq[String]): DataFrame = {
    val guarded = child.filter(allNotNull(child, fkCols))
    guarded.join(parent, joinCond(guarded, parent, fkCols, refCols),
      "left_anti")
  }

  /** DELETE-rule repair: drop orphans, keep NULL-component rows. */
  def deleteOrphans(child: DataFrame, parent: DataFrame,
      fkCols: Seq[String], refCols: Seq[String]): DataFrame = {
    val withNulls = child.filter(!allNotNull(child, fkCols))
    val kept = child.filter(allNotNull(child, fkCols))
      .join(parent, joinCond(child, parent, fkCols, refCols), "left_semi")
    kept.unionByName(withNulls)
  }

  /** SET NULL-rule repair: null out the FK columns on orphan rows
    * (reference `post.go:482-530` UPDATE … SET col = NULL variant).
    */
  def setNullOrphans(child: DataFrame, parent: DataFrame,
      fkCols: Seq[String], refCols: Seq[String]): DataFrame = {
    val parentKeys = parent.select(refCols.map(parent(_)): _*).distinct()
    val matched = child.join(parentKeys,
      joinCond(child, parentKeys, fkCols, refCols), "left_semi")
      .withColumn("__graft_matched", lit(true))
    val flagged = child.join(
      matched.select((fkCols.map(matched(_)) :+
        matched("__graft_matched")): _*).distinct(),
      fkCols, "left_outer")
    val isOrphan = allNotNull(flagged, fkCols) &&
      col("__graft_matched").isNull
    fkCols.foldLeft(flagged) { (df, c) =>
      df.withColumn(c, when(isOrphan, lit(null)).otherwise(col(c)))
    }.drop("__graft_matched")
  }
}
