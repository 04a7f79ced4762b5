package graft

import graft.functions.Transforms._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Value-matrix tests for the F2–F13 transform surface, reproducing the
  * reference's transform_test.go edge cases (FIXTURES.md §1.3): UUID byte
  * orders, GUID endianness, bit widths, ±838h TIMEs, zero dates, NUL
  * stripping, strict tinyint(1)/UUID error parity.
  */
class TransformsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def one[T](df: org.apache.spark.sql.DataFrame): T =
    df.collect()(0).getAs[T](0)

  test("F2 binary16 → uuid, straight and UUID_TO_BIN(u,1)-swapped") {
    val bytes = Array.tabulate[Byte](16)(_.toByte) // 000102...0f
    val df = Seq(Tuple1(bytes)).toDF("b")
    assert(one[String](df.select(binary16ToUuid(col("b")))) ==
      "00010203-0405-0607-0809-0a0b0c0d0e0f")
    // swapped storage [time_hi][time_mid][time_low]: unswap reorders
    // bytes 4-7, 2-3, 0-1 first.
    assert(one[String](df.select(binary16ToUuid(col("b"), swapped = true))) ==
      "04050607-0203-0001-0809-0a0b0c0d0e0f")
  }

  test("F3 MSSQL GUID mixed-endian → uuid") {
    // canonical 00010203-0405-0607-0809-0a0b0c0d0e0f stored as
    // 03020100 0504 0706 0809 0a0b0c0d0e0f
    val stored = Array[Byte](3, 2, 1, 0, 5, 4, 7, 6, 8, 9, 10, 11, 12, 13,
      14, 15)
    val df = Seq(Tuple1(stored)).toDF("b")
    assert(one[String](df.select(guidToUuid(col("b")))) ==
      "00010203-0405-0607-0809-0a0b0c0d0e0f")
  }

  test("F4 string uuid normalizes, errors on invalid") {
    val df = Seq("  550E8400-E29B-41D4-A716-446655440000  ").toDF("u")
    assert(one[String](df.select(stringUuidNormalize(col("u")))) ==
      "550e8400-e29b-41d4-a716-446655440000")
    val bad = Seq("not-a-uuid").toDF("u")
    intercept[Exception] {
      bad.select(stringUuidNormalize(col("u"))).collect()
    }
  }

  test("F5 strips NUL bytes") {
    val nul = 0.toChar
    val df = Seq(s"a${nul}b${nul}c").toDF("s")
    assert(one[String](df.select(stripNullBytes(col("s")))) == "abc")
  }

  test("F6 tinyint(1) strict boolean") {
    val df = Seq(0, 1).toDF("v")
    assert(df.select(tinyint1ToBoolean(col("v"))).collect()
      .map(_.getBoolean(0)).toSeq == Seq(false, true))
    intercept[Exception] {
      Seq(2).toDF("v").select(tinyint1ToBoolean(col("v"))).collect()
    }
  }

  test("F7 SET → array: empty string is empty set") {
    val df = Seq("a,b,c", "").toDF("s")
    val got = df.select(setToArray(col("s"))).collect()
      .map(_.getSeq[String](0).toList).toList
    assert(got == List(List("a", "b", "c"), Nil))
  }

  test("F8 bit(n) → rightmost-n bitstring") {
    val df = Seq(Tuple1(Array[Byte](0x05, 0x03.toByte))).toDF("b")
    assert(one[String](df.select(bitToBitstring(col("b"), 10))) ==
      "0100000011")
    assert(one[String](df.select(bitToBitstring(col("b"), 16))) ==
      "0000010100000011")
  }

  test("F10 MySQL TIME → interval incl. 838:59:59 and negatives") {
    val df = Seq("838:59:59", "-838:59:59", "00:00:01").toDF("t")
    val got = df.select(mysqlTimeToInterval(col("t")).cast("string"))
      .collect().map(_.getString(0)).toSeq
    assert(got(0).contains("34 22:59:59")) // 838h = 34d 22h
    assert(got(1).contains("-34 22:59:59"))
    assert(got(2).contains("0 00:00:01"))
  }

  test("F11 zero date → NULL (default) or error") {
    val df = Seq("0000-00-00 00:00:00", "2024-01-01 00:00:00").toDF("d")
    val got = df.select(zeroDateToNull(col("d"))).collect()
    assert(got(0).isNullAt(0))
    assert(!got(1).isNullAt(0))
    intercept[Exception] {
      Seq("0000-00-00").toDF("d")
        .select(zeroDateToNull(col("d"), errorMode = true)).collect()
    }
  }

  test("F12 spatial SRID+WKB → EWKB splice; SRID 0 passthrough") {
    // SRID 4326 LE prefix + minimal LE point WKB (type 1)
    val srid = Array[Byte](0xe6.toByte, 0x10, 0, 0)
    val wkb = Array[Byte](1, 1, 0, 0, 0) ++ Array.fill[Byte](16)(0x11)
    val df = Seq(Tuple1(srid ++ wkb)).toDF("g")
    val out = one[Array[Byte]](df.select(spatialToEwkb(col("g"))))
    assert(out.length == wkb.length + 4)
    assert(out(0) == 1)
    // type word now has 0x20000000 flag (LE byte 3 = 0x20)
    assert((out(4) & 0x20) == 0x20)
    // spliced SRID 4326 LE
    assert((out(5) & 0xff) == 0xe6 && out(6) == 0x10)
    val zeroSrid = Seq(Tuple1(Array[Byte](0, 0, 0, 0) ++ wkb)).toDF("g")
    assert(one[Array[Byte]](zeroSrid.select(spatialToEwkb(col("g"))))
      .sameElements(wkb))
  }

  test("F13 money → numeric(19,4)") {
    val df = Seq(12.3456789).toDF("m")
    assert(one[java.math.BigDecimal](df.select(moneyToNumeric(col("m"))))
      .toPlainString == "12.3457")
  }

  test("config-driven transform dispatch: [type_mapping] modes select " +
      "data-path mechanisms (mysqlTransformValue parity)") {
    import graft.sources.{SourceColumn, TypeOptions}
    val o = TypeOptions()
    def sel(dialect: String, c: SourceColumn, opts: TypeOptions) =
      graft.functions.Transforms.forColumn(dialect, c, opts)
    val t1 = SourceColumn("b", "tinyint", columnType = "tinyint(1)")
    // defaults: tinyint(1) passes through; flag selects the transform
    assert(sel("mysql", t1, o).isEmpty)
    assert(sel("mysql", t1, o.copy(tinyint1AsBoolean = true)).nonEmpty)
    // binary16 uuid + swap mode changes the BYTES decoded
    val b16 = SourceColumn("u", "binary", charMaxLen = Some(16))
    val bytes = Array[Byte](0x11, 0x11, 0x22, 0x22, 0x33, 0x33, 0x33, 0x33,
      0x44, 0x44, 0x55, 0x55, 0x55, 0x55, 0x55, 0x55)
    val df = Seq(Tuple1(bytes)).toDF("u")
    val plain = sel("mysql", b16,
      o.copy(binary16AsUuid = true)).get(col("u"))
    val swapped = sel("mysql", b16, o.copy(binary16AsUuid = true,
      binary16UuidMode = "mysql_uuid_to_bin_swap")).get(col("u"))
    assert(one[String](df.select(plain)) ==
      "11112222-3333-3333-4444-555555555555")
    assert(one[String](df.select(swapped)) ==
      "33333333-2222-1111-4444-555555555555")
    // set mode: text passthrough vs array split
    val st = SourceColumn("s", "set", columnType = "set('a','b')")
    assert(sel("mysql", st, o).isEmpty)
    assert(sel("mysql", st, o.copy(setMode = "text_array")).nonEmpty)
    // bit mode: width parsed from column_type
    val bit = SourceColumn("f", "bit", columnType = "bit(5)")
    assert(sel("mysql", bit, o).isEmpty)
    val bits = sel("mysql", bit, o.copy(bitMode = "bit")).get
    assert(one[String](Seq(Tuple1(Array[Byte](0x15)))
      .toDF("f").select(bits(col("f")))) == "10101")
    // time interval mode
    val tm = SourceColumn("t", "time")
    assert(sel("mysql", tm, o).isEmpty)
    assert(sel("mysql", tm, o.copy(timeMode = "interval")).nonEmpty)
    // zero_date error mode raises; null mode nulls
    val dtc = SourceColumn("d", "datetime")
    val zdf = Seq("0000-00-00 00:00:00").toDF("d")
    assert(zdf.select(sel("mysql", dtc, o).get(col("d")))
      .collect()(0).isNullAt(0))
    intercept[Exception] {
      zdf.select(sel("mysql", dtc,
        o.copy(zeroDateMode = "error")).get(col("d"))).collect()
    }
    // json sanitization on by default, off when disabled
    val js = SourceColumn("j", "json")
    assert(sel("mysql", js, o).nonEmpty)
    assert(sel("mysql", js,
      o.copy(sanitizeJsonNullBytes = false)).isEmpty)
    // mssql: money respects money_as_numeric
    val money = SourceColumn("m", "money")
    assert(sel("mssql", money, o).nonEmpty)
    assert(sel("mssql", money, o.copy(moneyAsNumeric = false)).isEmpty)
  }

  test("applyTo: the load path's transform projection rewrites exactly " +
      "the config-selected columns, leaves the rest streaming through") {
    import graft.sources.{SourceColumn, TypeOptions}
    val df = Seq((1, "a,b", "x")).toDF("flag", "tags", "plain")
    val cols = Seq(
      SourceColumn("flag", "tinyint", columnType = "tinyint(1)"),
      SourceColumn("tags", "set", columnType = "set('a','b')"),
      SourceColumn("plain", "varchar", charMaxLen = Some(10)))
    val out = graft.functions.Transforms.applyTo(df, cols, "mysql",
      TypeOptions(tinyint1AsBoolean = true, setMode = "text_array"))
    val r = out.collect()(0)
    assert(r.getBoolean(0) === true)
    assert(r.getSeq[String](1) == Seq("a", "b"))
    assert(r.getString(2) == "x")
    // defaults: nothing selected, frame untouched
    val same = graft.functions.Transforms.applyTo(df, cols, "mysql",
      TypeOptions())
    assert(same.collect()(0).getInt(0) == 1 &&
      same.collect()(0).getString(1) == "a,b")
  }

  test("valueForColumn: the single_tx raw-JDBC path applies the same " +
      "config-selected transforms at the JVM value level") {
    import graft.sources.{SourceColumn, TypeOptions}
    val o = TypeOptions(tinyint1AsBoolean = true, setMode = "text_array",
      bitMode = "varbit", binary16AsUuid = true, stringUuidAsUuid = true)
    def f(c: SourceColumn) = graft.functions.Transforms
      .valueForColumn("mysql", c, o).get
    val t1 = f(SourceColumn("f", "tinyint", columnType = "tinyint(1)"))
    assert(t1(Integer.valueOf(1)) == java.lang.Boolean.TRUE)
    assert(t1(Integer.valueOf(0)) == java.lang.Boolean.FALSE)
    assert(t1(null) == null) // F1 null passthrough
    intercept[IllegalArgumentException] { t1(Integer.valueOf(2)) }
    // drivers that pre-map tinyint(1)→boolean pass through
    assert(t1(java.lang.Boolean.TRUE) == java.lang.Boolean.TRUE)

    val set = f(SourceColumn("s", "set", columnType = "set('a','b')"))
    assert(set("a,b") == Seq("a", "b"))
    assert(set("") == Seq.empty[String])

    val bin = f(SourceColumn("u", "binary", charMaxLen = Some(16)))
    assert(bin(Array.tabulate[Byte](16)(_.toByte)) ==
      "00010203-0405-0607-0809-0a0b0c0d0e0f")
    intercept[IllegalArgumentException] { bin(Array[Byte](1, 2)) }

    val su = f(SourceColumn("u", "char", charMaxLen = Some(36)))
    assert(su("  550E8400-E29B-41D4-A716-446655440000 ") ==
      "550e8400-e29b-41d4-a716-446655440000")
    intercept[IllegalArgumentException] { su("nope") }

    val bit = f(SourceColumn("b", "bit", columnType = "bit(12)"))
    assert(bit(Array[Byte](0x0a, 0x55)) == "101001010101")
    assert(bit(java.lang.Boolean.TRUE) == "000000000001")

    val yr = graft.functions.Transforms
      .valueForColumn("mysql", SourceColumn("y", "year"), o).get
    assert(yr(java.sql.Date.valueOf("2024-01-01")) == 2024)
    assert(yr(java.lang.Short.valueOf(1999.toShort)) == 1999)

    val zd = graft.functions.Transforms.valueForColumn("mysql",
      SourceColumn("d", "datetime"), o).get
    assert(zd("0000-00-00 00:00:00") == null)
    val ts = java.sql.Timestamp.valueOf("2024-06-01 10:00:00")
    assert(zd(ts) == ts)
    intercept[IllegalArgumentException] {
      graft.functions.Transforms.valueForColumn("mysql",
        SourceColumn("d", "datetime"), o.copy(zeroDateMode = "error"))
        .get("0000-00-00")
    }

    // mssql GUID: bytes get the mixed-endian unscramble, pre-rendered
    // text normalizes
    val guid = graft.functions.Transforms.valueForColumn("mssql",
      SourceColumn("g", "uniqueidentifier"), o).get
    assert(guid(Array[Byte](3, 2, 1, 0, 5, 4, 7, 6, 8, 9, 10, 11, 12,
      13, 14, 15)) == "00010203-0405-0607-0809-0a0b0c0d0e0f")
    assert(guid("550E8400-E29B-41D4-A716-446655440000") ==
      "550e8400-e29b-41d4-a716-446655440000")

    // untransformed column → None (identity on the loader side)
    assert(graft.functions.Transforms.valueForColumn("mysql",
      SourceColumn("p", "varchar", charMaxLen = Some(10)), o).isEmpty)
  }
}
