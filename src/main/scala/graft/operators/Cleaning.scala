package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's data-cleaning vocabulary as composable Column functions.
  * All of it is Catalyst-native expression work (no UDFs), so every function
  * here stays inside whole-stage codegen and is pushdown/pruning-friendly.
  *
  * Sources (reference, read-only): etl/transform.py:53-87 (whitespace scrub,
  * quote strip, email+phone normalize), 139-149 (price validation), 184-251
  * (ID prefix repair + whitelist), etl/loader.py:55-57 (channel derivation).
  */
object Cleaning {

  /** F1: collapse tabs/CRs/LFs to a space and trim (ref: transform.py:53-57,
    * applied to every column in a loop — here a single projection pass).
    */
  def scrubWhitespace(c: Column): Column =
    trim(regexp_replace(c, "[\\t\\r\\n]+", " "))

  def scrubWhitespaceAll(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(df.columns.map { name =>
      if (cols.contains(name)) scrubWhitespace(col(name)).as(name) else col(name)
    }: _*)

  /** F2: strip leading/trailing whitespace+quotes, drop inner double quotes
    * (ref: transform.py:63-70,308-311). */
  def stripEdgeQuotes(c: Column): Column =
    regexp_replace(regexp_replace(c, "^[\\s\"]+|[\\s\"]+$", ""), "\"", "")

  /** F3: lowercase + keep email-safe characters (ref: transform.py:61,372). */
  def normalizeEmail(c: Column): Column =
    lower(trim(regexp_replace(c, "[^a-zA-Z0-9._%+\\-@]+", "")))

  /** F4: strip leading zeros; a 9-digit remainder gets the country prefix,
    * anything else becomes NULL (ref: transform.py:72-87). */
  def standardizePhone(c: Column, prefix: String = "+33"): Column = {
    val stripped = regexp_replace(c, "^0+", "")
    when(length(stripped) === 9 && stripped.rlike("^[0-9]+$"),
      concat(lit(prefix), stripped)).otherwise(lit(null).cast("string"))
  }

  /** F6: NULL out unparseable price strings, else cast (ref:
    * transform.py:139-149 — the `"x"` sentinel is caught by the cast-null
    * branch, matching the reference's actual behavior). Spark 4 ANSI mode
    * makes a plain cast THROW on malformed input, so the null-on-failure
    * semantics of the reference's PySpark cast need try_cast here.
    */
  def validatedPrice(c: Column): Column = {
    val d = c.try_cast("double")
    when(c.isNull || trim(c) === "" || d.isNull, lit(null).cast("double")).otherwise(d)
  }

  /** F7/F8: repair known-bad ID prefixes via a when-chain (ref:
    * transform.py:184-220 repairs `XXMO`->`MO01` etc.). `repairs` maps
    * bad prefix -> replacement; unmatched IDs pass through unchanged. */
  def repairIdPrefix(c: Column, repairs: Seq[(String, String)]): Column = {
    val chain = repairs.foldLeft(lit(null).cast("string")) { case (acc, (bad, good)) =>
      when(c.startsWith(bad), concat(lit(good), c.substr(lit(bad.length + 1), length(c))))
        .otherwise(acc)
    }
    coalesce(chain, c)
  }

  /** F8: derive + whitelist-validate a store ID from an ID prefix (ref:
    * transform.py:222-251). */
  def storeIdFrom(c: Column, width: Int, whitelist: Seq[String]): Column = {
    val sid = substring(c, 1, width)
    when(sid.isin(whitelist: _*), sid).otherwise(lit(null).cast("string"))
  }

  /** F10: channel type from FK nullness (ref: etl/loader.py:55-57). */
  def channelType(storeId: Column): Column =
    when(storeId.isNull, lit("Online")).otherwise(lit("Store"))
}
