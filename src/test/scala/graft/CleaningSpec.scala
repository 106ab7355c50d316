package graft

import org.apache.spark.sql.functions._
import graft.operators.Cleaning

/** Golden tests for every Cleaning function against the reference's own edge
  * cases (ref: etl/transform.py:53-87 whitespace/phone, 139-149 price "x"
  * sentinel, 184-251 prefix repair + store whitelist, etl/loader.py:55-57
  * channel derivation).
  */
class CleaningSpec extends SparkTestBase {
  import spark.implicits._

  private def one(in: String, c: org.apache.spark.sql.Column): String =
    Seq(Option(in)).toDF("v").select(c.as("r")).collect()(0).getAs[String]("r")

  test("standardizePhone: 9 digits after zero-strip gets +33") {
    assert(one("0612345678", Cleaning.standardizePhone(col("v"))) == "+33612345678")
  }
  test("standardizePhone: non-9-digit remainder is wiped to null (transform.py:86)") {
    assert(one("12345", Cleaning.standardizePhone(col("v"))) == null)
    assert(one("0012345678", Cleaning.standardizePhone(col("v"))) == null) // 8 left
    assert(one("061234567890", Cleaning.standardizePhone(col("v"))) == null) // 11 left
  }
  test("standardizePhone: non-digit content is wiped to null") {
    assert(one("06A2345678", Cleaning.standardizePhone(col("v"))) == null)
    assert(one(null, Cleaning.standardizePhone(col("v"))) == null)
  }

  test("validatedPrice: the 'x' sentinel, blanks and nulls become null (transform.py:139-149)") {
    def p(in: String): java.lang.Double =
      Seq(Option(in)).toDF("v").select(Cleaning.validatedPrice(col("v")).as("r"))
        .collect()(0).getAs[java.lang.Double]("r")
    assert(p("x") == null)
    assert(p("X") == null)
    assert(p("") == null)
    assert(p("  ") == null)
    assert(p(null) == null)
    assert(p("12.5") == 12.5)
    assert(p("7") == 7.0)
  }

  test("repairIdPrefix: XXMO->MO01 style when-chain (transform.py:184-220)") {
    val repairs = Seq("XXMO" -> "MO01", "XXBO" -> "BO02")
    def r(in: String): String = one(in, Cleaning.repairIdPrefix(col("v"), repairs))
    assert(r("XXMO240800001") == "MO01240800001")
    assert(r("XXBO240800001") == "BO02240800001")
    assert(r("MO01240800001") == "MO01240800001") // untouched passthrough
    assert(r(null) == null)
  }

  test("storeIdFrom: substring + whitelist, else null (transform.py:222-251)") {
    val wl = Seq("BO02", "MO01")
    def s(in: String): String = one(in, Cleaning.storeIdFrom(col("v"), 4, wl))
    assert(s("BO02240800001") == "BO02")
    assert(s("ZZ99240800001") == null)
  }

  test("channelType: null store => Online, else Store (loader.py:55-57)") {
    def ch(in: String): String = one(in, Cleaning.channelType(col("v")))
    assert(ch(null) == "Online")
    assert(ch("BO02") == "Store")
  }

  test("scrubWhitespace collapses tabs/CRs/LFs and trims (transform.py:53-57)") {
    assert(one("a\tb\r\nc ", Cleaning.scrubWhitespace(col("v"))) == "a b c")
  }

  test("stripEdgeQuotes removes edge whitespace+quotes and inner quotes (transform.py:63-70)") {
    assert(one("  \"abc\"d\"  ", Cleaning.stripEdgeQuotes(col("v"))) == "abcd")
  }

  test("normalizeEmail lowercases and keeps email-safe chars (transform.py:61,372)") {
    assert(one(" John.Doe+x@EX.com\n", Cleaning.normalizeEmail(col("v"))) == "john.doe+x@ex.com")
  }

  test("scrubWhitespaceAll only touches requested columns") {
    val df = Seq(("a\tb", "c\td")).toDF("x", "y")
    val out = Cleaning.scrubWhitespaceAll(df, Seq("x")).collect()(0)
    assert(out.getString(0) == "a b" && out.getString(1) == "c\td")
  }
}
