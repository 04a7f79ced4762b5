package graft

import graft.sources._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** MSSQL introspection CONTRACT test — completes the MySQL/SQLite
  * trio (`MySqlContractSpec`, `SqliteContractSpec`): no SQL Server in
  * this sandbox, so the contract pins (1) the sys.* catalog queries'
  * field/filter/order parity against `source_mssql.go:179-508`, and
  * (2) an AdventureWorks-shaped recorded result set replayed through
  * assembly → type mapping → DDL, covering the MSSQL-specific
  * behaviors a socket would exercise: nvarchar byte-halving, identity,
  * computed columns, DESC index key parts, included-column exclusion,
  * filtered/XML index skip flags, FK action normalization, and the
  * cross-schema FK warning.
  */
class MssqlContractSpec extends AnyFunSuite {

  private def fields(sql: String): Set[String] = {
    val sel = sql.substring(sql.indexOf("SELECT") + 6,
      sql.indexOf("FROM"))
    sel.split(",").map(_.trim.split("[ .]").last.toUpperCase).toSet
  }

  test("contract 1/2: the sys.* catalog queries project every field " +
      "the reference scans, with its filters and ordering") {
    import Introspection.Mssql

    // columns (source_mssql.go:205-234): every scanned field, hidden
    // columns excluded, (table, column_id) ordering
    val c = Mssql.columnsSql("dbo")
    val refCols = Set("TABLE_NAME", "COLUMN_NAME", "TYPE_NAME",
      "MAX_LENGTH", "PRECISION", "SCALE", "IS_NULLABLE",
      "DEFAULT_DEFINITION", "IS_IDENTITY", "COMPUTED_DEFINITION",
      "COLLATION_NAME", "COLUMN_ID")
    assert(refCols.subsetOf(fields(c)), s"missing: ${refCols.diff(fields(c))}")
    assert(c.contains("is_hidden = 0"))
    assert(c.contains("ORDER BY t.name, c.column_id"))

    // indexes (source_mssql.go:319-345): key ordinal, DESC flag,
    // included-column flag; type>0 + named filters; reference ordering
    val ix = Mssql.indexesSql("dbo")
    val refIx = Set("TABLE_NAME", "INDEX_NAME", "IS_UNIQUE",
      "IS_PRIMARY_KEY", "TYPE_DESC", "HAS_FILTER", "KEY_ORDINAL",
      "COLUMN_NAME", "IS_INCLUDED_COLUMN", "IS_DESCENDING_KEY")
    assert(refIx.subsetOf(fields(ix)), s"missing: ${refIx.diff(fields(ix))}")
    assert(ix.contains("i.type > 0") && ix.contains("i.name IS NOT NULL"))
    assert(ix.replaceAll("\\s+", " ").contains(
      "ORDER BY t.name, i.index_id, ic.is_included_column, ic.key_ordinal"))

    // foreign keys (source_mssql.go:434-452): action descs, constraint
    // column ordering, and the referenced table's schema for the
    // cross-schema warning (:477-481)
    val fk = Mssql.foreignKeysSql("dbo")
    val refFk = Set("TABLE_NAME", "FK_NAME", "COLUMN_NAME", "REF_TABLE",
      "REF_COLUMN", "UPDATE_ACTION", "DELETE_ACTION",
      "CONSTRAINT_COLUMN_ID", "REF_SCHEMA")
    assert(refFk.subsetOf(fields(fk)), s"missing: ${refFk.diff(fields(fk))}")
    assert(fk.replaceAll("\\s+", " ").contains(
      "ORDER BY t.name, fk.name, fkc.constraint_column_id"))

    // all scope on the bound schema
    Seq(c, ix, fk).foreach(q => assert(q.contains("s.name = 'dbo'")))
  }

  test("contract 2/2: recorded AdventureWorks-shaped sys.* rows " +
      "replay through assembly, type mapping, and DDL") {
    // columns: (table, column, type, max_length, precision, scale,
    // nullable, default, is_identity, computed_def, collation, col_id)
    val colRows = Seq(
      Row("product", "ProductID", "int", 4, 10, 0, 0, null, 1, null,
        null, 1),
      Row("product", "Name", "nvarchar", 100, 0, 0, 0, null, 0, null,
        "SQL_Latin1_General_CP1_CI_AS", 2),
      Row("product", "Price", "money", 8, 19, 4, 1, "((0))", 0, null,
        null, 3),
      Row("product", "Total", "numeric", 9, 19, 4, 1, null, 0,
        "([Price]*(1.1))", null, 4),
      Row("orders", "OrderID", "int", 4, 10, 0, 0, null, 1, null,
        null, 1),
      Row("orders", "ProductID", "int", 4, 10, 0, 0, null, 0, null,
        null, 2),
      Row("orders", "Stamp", "datetime2", 8, 27, 7, 0, "(getdate())",
        0, null, null, 3))
    // indexes: (table, index, unique, pk, type_desc, has_filter,
    // key_ordinal, column, is_included, is_descending)
    val ixRows = Seq(
      Row("product", "pk_product", 1, 1, "CLUSTERED", 0, 1, "ProductID",
        0, 0),
      Row("product", "ix_price_desc", 0, 0, "NONCLUSTERED", 0, 1,
        "Price", 0, 1), // DESC key part
      Row("product", "ix_price_desc", 0, 0, "NONCLUSTERED", 0, 0,
        "Name", 1, 0), // included column — excluded from key list
      Row("product", "ix_filtered", 0, 0, "NONCLUSTERED", 1, 1,
        "Name", 0, 0), // filtered → hasExpression → skipped in DDL
      Row("orders", "pk_orders", 1, 1, "CLUSTERED", 0, 1, "OrderID",
        0, 0))
    // fks: (table, fk, column, ref_table, ref_column, upd, del,
    // constraint_column_id, ref_schema)
    val fkRows = Seq(
      Row("orders", "fk_orders_product", "ProductID", "product",
        "ProductID", "NO_ACTION", "CASCADE", 1, "dbo"),
      Row("orders", "fk_orders_audit", "OrderID", "audit_log",
        "OrderID", "NO_ACTION", "SET_NULL", 1, "audit"))

    val warns = scala.collection.mutable.Buffer[String]()
    val (sts, fks) = Introspection.assembleMssql(colRows, ixRows,
      fkRows, sourceSchema = "dbo", onWarn = warns += _)

    // nvarchar(100 bytes) → 50 chars; identity → auto_increment;
    // computed captured; money default paren-stripped
    val product = sts.find(_.name == "product").get
    assert(product.columns(1).charMaxLen.contains(50))
    assert(product.columns.head.extra == "auto_increment")
    assert(product.columns(3).generationExpression == "([Price]*(1.1))")
    assert(product.columns(2).default.contains("0"))

    // DESC key part captured as a direction; included column excluded
    val ixd = product.indexes.find(_.name == "ix_price_desc").get
    assert(ixd.columns == Seq("Price"))
    assert(ixd.directions == Seq("DESC"))
    // filtered index flagged for the DDL skip
    assert(product.indexes.find(_.name == "ix_filtered").get.hasExpression)

    // FK action normalization NO_ACTION → NO ACTION, SET_NULL → SET NULL
    val fko = fks("orders")
    assert(fko.find(_.name == "fk_orders_product").get.onDelete ==
      "CASCADE")
    assert(fko.find(_.name == "fk_orders_audit").get.onDelete ==
      "SET NULL")
    assert(fko.forall(_.onUpdate == "NO ACTION"))

    // cross-schema FK warned exactly once (audit.audit_log ∉ dbo)
    assert(warns.size == 1 && warns.head.contains("audit.audit_log"),
      warns.mkString("; "))

    // type mapping + DDL: DESC survives into CREATE INDEX; the
    // filtered index is skipped by the pipeline's shared rule
    val meta = SchemaMapping.toTableMeta(MssqlDialect, product,
      fks.getOrElse("product", Nil), TypeOptions())
    val ddl = DdlGenerator.createIndex("tgt", "product",
      meta.indexes.find(_.name == "ix_price_desc").get)
    assert(ddl.contains("\"price\" DESC"), ddl)
    assert(PlanReport.indexSkipReason(
      meta.indexes.find(_.name == "ix_filtered").get).isDefined)
  }
}
