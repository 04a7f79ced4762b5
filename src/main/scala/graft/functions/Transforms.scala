package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's per-row transform surface (`TransformValue`,
  * reference `migrate.go:459-466`) as Spark column expressions.
  *
  * Catalyst-expressible transforms stay `Column` compositions (codegen'd,
  * null-propagating — F1 null passthrough is automatic, reference
  * `source_mysql.go:647-649`); only the byte-surgery functions
  * (F2/F3/F12 UUID byte orders and EWKB splicing) are Scala UDFs, per
  * SURVEY.md §7.2.
  *
  * Error parity: the reference FAILS migrations on invalid tinyint(1) /
  * UUID values (`source_mysql.go:695-716,690-692`) — mirrored here with
  * `raise_error`, not permissive casts.
  */
object Transforms {

  // ---- byte helpers -------------------------------------------------

  private def hexUuid(b: Array[Byte]): String = {
    val h = b.map("%02x".format(_)).mkString
    s"${h.substring(0, 8)}-${h.substring(8, 12)}-${h.substring(12, 16)}-" +
      s"${h.substring(16, 20)}-${h.substring(20, 32)}"
  }

  /** Plain-JVM byte surgery shared by the Column udfs and the raw-JDBC
    * value path ([[valueForColumn]]).
    */
  private[graft] def binary16Bytes(b: Array[Byte], swapped: Boolean): String = {
    if (b.length != 16)
      throw new IllegalArgumentException(
        s"binary16 uuid must be 16 bytes, got ${b.length}")
    if (swapped)
      hexUuid(b.slice(4, 8) ++ b.slice(2, 4) ++ b.slice(0, 2) ++
        b.slice(8, 16))
    else hexUuid(b)
  }

  private[graft] def guidBytes(b: Array[Byte]): String = {
    if (b.length != 16)
      throw new IllegalArgumentException(
        s"guid must be 16 bytes, got ${b.length}")
    hexUuid(
      b.slice(0, 4).reverse ++ b.slice(4, 6).reverse ++
        b.slice(6, 8).reverse ++ b.slice(8, 16))
  }

  private[graft] def bitstringBytes(b: Array[Byte], width: Int): String = {
    val full = b.map(x => String.format(
      "%8s", Integer.toBinaryString(x & 0xff)).replace(' ', '0'))
      .mkString
    if (full.length >= width) full.substring(full.length - width)
    else "0" * (width - full.length) + full
  }

  private[graft] def spatialBytesToEwkb(b: Array[Byte]): Array[Byte] = {
    if (b.length < 9)
      throw new IllegalArgumentException(
        s"spatial value too short: ${b.length} bytes")
    val srid = java.nio.ByteBuffer.wrap(b, 0, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    if (srid < 0)
      throw new IllegalArgumentException(s"invalid SRID $srid")
    val wkb = b.drop(4)
    if (srid == 0) wkb
    else {
      val littleEndian = wkb(0) == 1
      val order =
        if (littleEndian) java.nio.ByteOrder.LITTLE_ENDIAN
        else java.nio.ByteOrder.BIG_ENDIAN
      val geomType = java.nio.ByteBuffer.wrap(wkb, 1, 4).order(order)
        .getInt
      val out = java.nio.ByteBuffer.allocate(wkb.length + 4).order(order)
      out.put(wkb(0))
      out.putInt(geomType | 0x20000000)
      out.putInt(srid)
      out.put(wkb, 5, wkb.length - 5)
      out.array()
    }
  }

  /** F2 — MySQL binary(16) → canonical UUID text
    * (reference `source_mysql.go:652-668`). `swapped = true` undoes
    * MySQL `UUID_TO_BIN(u, 1)` time-field reordering: stored layout is
    * [time_hi(2)][time_mid(2)][time_low(4)][rest(8)].
    */
  def binary16ToUuid(c: Column, swapped: Boolean = false): Column = {
    val f = udf { (b: Array[Byte]) =>
      if (b == null) null else binary16Bytes(b, swapped)
    }
    f(c)
  }

  /** F3 — MSSQL uniqueidentifier mixed-endian GUID → canonical UUID
    * (reference `source_mssql.go:856-878`): bytes 0-3 LE, 4-5 LE,
    * 6-7 LE, 8-15 big-endian.
    */
  def guidToUuid(c: Column): Column = {
    val f = udf { (b: Array[Byte]) => if (b == null) null else guidBytes(b) }
    f(c)
  }

  private val UuidRe =
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"

  /** F4 — char(36) UUID normalize: trim, validate (hard error on
    * mismatch, reference `source_mysql.go:679-693`), lowercase.
    */
  def stringUuidNormalize(c: Column): Column = {
    val trimmed = trim(c)
    when(c.isNull, lit(null).cast(StringType))
      .when(trimmed.rlike(UuidRe), lower(trimmed))
      .otherwise(raise_error(concat(lit("invalid uuid value: "), trimmed)))
  }

  /** F5 — strip NUL bytes from text (PG rejects them; reference
    * `source_mysql.go:670-677`).
    */
  def stripNullBytes(c: Column): Column =
    regexp_replace(c, "\\x00", "")

  /** F6 — MySQL tinyint(1) → boolean, strict 0/1 domain (hard error
    * otherwise, reference `source_mysql.go:695-716`).
    */
  def tinyint1ToBoolean(c: Column): Column =
    when(c.isNull, lit(null).cast(BooleanType))
      .when(c === 0, lit(false))
      .when(c === 1, lit(true))
      .otherwise(raise_error(
        concat(lit("invalid tinyint(1) boolean value: "),
          c.cast(StringType))).cast(BooleanType))

  /** F7 — MySQL SET → text[] : empty string is the empty set, elements
    * NUL-stripped (reference `source_mysql.go:718-733`).
    */
  def setToArray(c: Column): Column =
    when(c.isNull, lit(null).cast(ArrayType(StringType)))
      .when(c === "", array().cast(ArrayType(StringType)))
      .otherwise(split(stripNullBytes(c), ","))

  /** F8 — MySQL bit(n) → binary string of the rightmost n bits
    * (reference `source_mysql.go:735-758`).
    */
  def bitToBitstring(c: Column, width: Int): Column = {
    val f = udf { (b: Array[Byte]) =>
      if (b == null) null else bitstringBytes(b, width)
    }
    f(c)
  }

  /** F9 — MySQL year → integer (reference `source_mysql.go:760-777`). */
  def yearToInt(c: Column): Column = c.cast(IntegerType)

  /** F10 — MySQL TIME `[-]HHH:MM:SS[.ffffff]` → day-time interval,
    * supporting the full ±838:59:59 range and per-component negation
    * (reference `source_mysql.go:779-794,998-1035`).
    */
  def mysqlTimeToInterval(c: Column): Column = {
    val sign = when(c.startsWith("-"), lit(-1L)).otherwise(lit(1L))
    val h = regexp_extract(c, "^-?(\\d+):", 1).cast(LongType)
    val m = regexp_extract(c, "^-?\\d+:(\\d{2}):", 1).cast(LongType)
    val sec = regexp_extract(c, ":(\\d{2}(?:\\.\\d+)?)$", 1)
      .cast(DecimalType(18, 6))
    when(c.isNull, lit(null))
      .otherwise(make_dt_interval(
        lit(0), (sign * h).cast(IntegerType), (sign * m).cast(IntegerType),
        (sign.cast(DecimalType(18, 6)) * sec)))
  }

  /** F11 — MySQL zero-date handling: `0000-00-00[ 00:00:00]` → NULL
    * (default mode) or hard error (reference `source_mysql.go:796-814`).
    */
  def zeroDateToNull(c: Column, errorMode: Boolean = false): Column = {
    val isZero = c.startsWith("0000-00-00")
    if (errorMode)
      when(isZero, raise_error(lit("zero date encountered"))
        .cast(TimestampType))
        .otherwise(c.cast(TimestampType))
    else when(isZero, lit(null).cast(TimestampType))
      .otherwise(c.cast(TimestampType))
  }

  /** F12 — MySQL spatial (4-byte LE SRID prefix + WKB) → PostGIS EWKB:
    * validate ≥9 bytes and SRID ≤ 0x7FFFFFFF, honor the WKB byte-order
    * marker, OR 0x20000000 into the geometry type word, splice the SRID
    * after it; SRID 0 stays plain WKB (reference
    * `source_mysql.go:940-986`).
    */
  def spatialToEwkb(c: Column): Column = {
    val f = udf { (b: Array[Byte]) =>
      if (b == null) null else spatialBytesToEwkb(b)
    }
    f(c)
  }

  /** F13 — MSSQL money → numeric(19,4) (reference
    * `source_mssql.go:880-891`; default `money_as_numeric=true`,
    * `config.go:356`).
    */
  def moneyToNumeric(c: Column): Column = c.cast(DecimalType(19, 4))

  /** The config-driven transform selector — the Spark spelling of the
    * reference's per-row `mysqlTransformValue` /
    * `mssqlTransformValue` dispatch (`source_mysql.go:645-830`,
    * `source_mssql.go:860-900`): given an introspected column and the
    * job's `[type_mapping]` options, pick the column transform (None =
    * identity passthrough). This is what makes every TOML mode key
    * actually select a data-path mechanism, not just a DDL type.
    */
  /** Apply [[forColumn]] across a scanned source DataFrame — the load
    * path's transform-projection stage (one `withColumn` per affected
    * column; untouched columns stream through).
    */
  def applyTo(df: org.apache.spark.sql.DataFrame,
      columns: Seq[graft.sources.SourceColumn],
      dialect: String,
      o: graft.sources.TypeOptions): org.apache.spark.sql.DataFrame =
    columns.foldLeft(df) { (d, c) =>
      forColumn(dialect, c, o) match {
        case Some(f) if d.columns.contains(c.name) =>
          d.withColumn(c.name, f(org.apache.spark.sql.functions.col(c.name)))
        case _ => d
      }
    }

  def forColumn(dialect: String,
      c: graft.sources.SourceColumn,
      o: graft.sources.TypeOptions): Option[Column => Column] = {
    val dt = c.dataType.toLowerCase
    val ct = c.columnType.toLowerCase
    val spatial = Set("geometry", "point", "linestring", "polygon",
      "multipoint", "multilinestring", "multipolygon",
      "geometrycollection")
    dialect match {
      case "mysql" => dt match {
        case "tinyint" if ct.startsWith("tinyint(1)") &&
            o.tinyint1AsBoolean =>
          Some(tinyint1ToBoolean)
        case "binary" if c.charMaxLen.contains(16) && o.binary16AsUuid =>
          Some(binary16ToUuid(_,
            swapped = o.binary16UuidMode == "mysql_uuid_to_bin_swap"))
        case "char" | "varchar"
            if c.charMaxLen.contains(36) && o.stringUuidAsUuid =>
          Some(stringUuidNormalize)
        case "set" if o.setMode != "text" => Some(setToArray)
        case "bit" if o.bitMode != "bytea" =>
          val w = graft.sources.MySqlDialect.typeLength(ct, "bit")
            .orElse(c.precision).filter(_ > 0).getOrElse(1)
          Some(bitToBitstring(_, w))
        case "year" => Some(yearToInt)
        case "time" if o.timeMode == "interval" =>
          Some(mysqlTimeToInterval)
        case "datetime" =>
          Some(zeroDateToNull(_, errorMode = o.zeroDateMode == "error"))
        case "json" if o.sanitizeJsonNullBytes => Some(stripNullBytes)
        case t if spatial(t) && o.usePostGis => Some(spatialToEwkb)
        case _ => None
      }
      case "mssql" => dt match {
        case "money" | "smallmoney" if o.moneyAsNumeric =>
          Some(moneyToNumeric)
        case "uniqueidentifier" => Some(guidToUuid)
        case _ => None
      }
      case _ => None
    }
  }

  // ---- raw-JDBC value path (single_tx) ------------------------------

  private def vBytes(what: String)(v: Any): Array[Byte] = v match {
    case b: Array[Byte] => b
    case other => throw new IllegalArgumentException(
      s"$what: expected binary value, got ${other.getClass.getName}")
  }

  private val vTinyint1: Any => Any = {
    case b: java.lang.Boolean => b // driver already mapped tinyint(1)
    case n: java.lang.Number => n.longValue() match {
      case 0L => java.lang.Boolean.FALSE
      case 1L => java.lang.Boolean.TRUE
      case other => throw new IllegalArgumentException(
        s"invalid tinyint(1) boolean value: $other")
    }
    case other => throw new IllegalArgumentException(
      s"invalid tinyint(1) boolean value: $other")
  }

  private val vStringUuid: Any => Any = { v =>
    val trimmed = String.valueOf(v).trim
    if (!trimmed.matches(UuidRe))
      throw new IllegalArgumentException(s"invalid uuid value: $trimmed")
    trimmed.toLowerCase
  }

  private val vSetToArray: Any => Any = { v =>
    val s = String.valueOf(v).replace("\u0000", "")
    if (s.isEmpty) Seq.empty[String] else s.split(",", -1).toSeq
  }

  private def vBit(width: Int): Any => Any = {
    case b: java.lang.Boolean => // MySQL Connector/J maps bit(1) → boolean
      bitstringBytes(Array[Byte](if (b) 1 else 0), width)
    case n: java.lang.Number =>
      val l = n.longValue()
      bitstringBytes((0 until 8).reverseIterator
        .map(i => ((l >>> (i * 8)) & 0xff).toByte).toArray, width)
    case v => bitstringBytes(vBytes("bit")(v), width)
  }

  private val vYear: Any => Any = {
    case d: java.sql.Date => Integer.valueOf(d.toLocalDate.getYear)
    case n: java.lang.Number => Integer.valueOf(n.intValue())
    case other => Integer.valueOf(String.valueOf(other).trim.toInt)
  }

  /** MySQL TIME text already parses as a PostgreSQL interval literal
    * (`'-838:59:59'` is valid interval input), so the value path only
    * normalizes to the text form; java.sql.Time can't carry the >24 h
    * range, so string passthrough is the faithful spelling.
    */
  private val vTimeInterval: Any => Any = v => String.valueOf(v)

  private def vZeroDate(errorMode: Boolean): Any => Any = {
    case s: String if s.startsWith("0000-00-00") =>
      if (errorMode) throw new IllegalArgumentException(
        "zero date encountered")
      else null
    case other => other
  }

  private val vStripNul: Any => Any =
    v => String.valueOf(v).replace("\u0000", "")

  /** Value-level counterpart of [[forColumn]] for the raw-JDBC
    * `single_tx` row path ([[graft.sources.SingleTxTableLoader]]): that
    * loader streams ResultSet objects with no DataFrame in between, so
    * the config-selected transforms must run per JVM value or modes like
    * `binary16_as_uuid` / `bit_mode=bit` / `set_mode=text_array` /
    * `tinyint1_as_boolean` would insert source-form values into the
    * transformed target column types. Same dispatch and error parity as
    * the Column form; nulls pass through (F1).
    */
  def valueForColumn(dialect: String,
      c: graft.sources.SourceColumn,
      o: graft.sources.TypeOptions): Option[Any => Any] = {
    val dt = c.dataType.toLowerCase
    val ct = c.columnType.toLowerCase
    val spatial = Set("geometry", "point", "linestring", "polygon",
      "multipoint", "multilinestring", "multipolygon",
      "geometrycollection")
    val picked: Option[Any => Any] = dialect match {
      case "mysql" => dt match {
        case "tinyint" if ct.startsWith("tinyint(1)") &&
            o.tinyint1AsBoolean =>
          Some(vTinyint1)
        case "binary" if c.charMaxLen.contains(16) && o.binary16AsUuid =>
          Some(v => binary16Bytes(vBytes("binary16 uuid")(v),
            swapped = o.binary16UuidMode == "mysql_uuid_to_bin_swap"))
        case "char" | "varchar"
            if c.charMaxLen.contains(36) && o.stringUuidAsUuid =>
          Some(vStringUuid)
        case "set" if o.setMode != "text" => Some(vSetToArray)
        case "bit" if o.bitMode != "bytea" =>
          val w = graft.sources.MySqlDialect.typeLength(ct, "bit")
            .orElse(c.precision).filter(_ > 0).getOrElse(1)
          Some(vBit(w))
        case "year" => Some(vYear)
        case "time" if o.timeMode == "interval" => Some(vTimeInterval)
        case "datetime" =>
          Some(vZeroDate(errorMode = o.zeroDateMode == "error"))
        case "json" if o.sanitizeJsonNullBytes => Some(vStripNul)
        case t if spatial(t) && o.usePostGis =>
          Some(v => spatialBytesToEwkb(vBytes("spatial")(v)))
        case _ => None
      }
      case "mssql" => dt match {
        // money arrives as BigDecimal from JDBC — numeric(19,4) takes it
        // directly, no value change needed
        case "uniqueidentifier" =>
          Some {
            case s: String => vStringUuid(s) // driver may pre-render text
            case v => guidBytes(vBytes("guid")(v))
          }
        case _ => None
      }
      case _ => None
    }
    picked.map(f => (v: Any) => if (v == null) null else f(v))
  }
}
