package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass table profiling — the data-QA sweep a corpus build runs
  * before and after every curation stage: per-column non-null count,
  * null count, distinct count, min/max. One aggregate job over one
  * scan; the per-column stats ride the same pass (Catalyst plans the
  * multi-distinct via Expand — one shuffle, rows × |cols| expansion,
  * map-side partials first).
  */
object Profile {

  /** Rendered numbers whose fractional part ends in a zero — the one
    * string shape engines disagree on when rendering a DECIMAL
    * ("1013.70" vs "1013.7" across DuckDB versions). Java-regex ∩ RE2
    * subset (see TextFunctions.PiiPatterns) so the SQL oracle evaluates
    * the same pattern verbatim.
    */
  val TrailingZeroDecimal: String = "^-?[0-9]+\\.[0-9]*0$"

  /** Canonical numeric rendering: IF the string is a decimal ending in
    * a fractional zero, strip the trailing zeros (then a bare trailing
    * dot), so "1013.70", "1013.7" and "1013.700" all read "1013.7" no
    * matter which engine rendered them. Non-matching strings (integers,
    * text columns) pass through untouched.
    */
  def canonicalNumber(c: Column): Column =
    when(c.rlike(TrailingZeroDecimal),
      regexp_replace(regexp_replace(c, "0+$", ""), "\\.$", ""))
      .otherwise(c)

  /** One row per profiled column: (col_name, n, n_nulls, n_distinct,
    * min_value, max_value). Min/max are rendered as strings so columns
    * of different types share the output schema — callers should
    * pre-cast doubles to DECIMAL for engine-stable rendering (plain
    * double→string formatting diverges across engines above 1e7), and
    * the rendering is canonicalized via [[canonicalNumber]] so the
    * result hashes identically whichever engine produced it.
    *
    * `exact = false` swaps the distinct counts for
    * approx_count_distinct — the 100 TB default, where the Expand
    * multiplier and the exact-distinct shuffle are the cost that
    * matters and ±2% on a QA dashboard is free.
    */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"${c}__nd"),
        canonicalNumber(min(col(c)).cast("string")).as(s"${c}__min"),
        canonicalNumber(max(col(c)).cast("string")).as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `${c}__n`, `${c}__nulls`, `${c}__nd`, `${c}__min`, `${c}__max`"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n, n_nulls, n_distinct, min_value, max_value)")
  }
}
