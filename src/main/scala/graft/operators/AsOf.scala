package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (latest-prior) join — the temporal-alignment operator Spark lacks
  * natively: pair each left row with the right row having the greatest
  * right-time ≤ left-time for the same key (DuckDB `ASOF JOIN` semantics,
  * inclusive).
  *
  * Built by COMPOSITION (preference (a) before custom plans): tag and union
  * both sides, one window pass per key carrying the last non-null right
  * values forward, keep left rows. Cost at scale: ONE shuffle on the key +
  * an in-partition sort — no pairwise candidate work, state bounded by the
  * carried columns. (A range-partitioned merge as a custom SparkPlan is the
  * next rung if a single key's timeline exceeds one task's sort budget.)
  */
object AsOf {

  /** @param carry right-side columns to carry onto left rows, as
    *              (rightColumn → outputName); output names must not clash
    *              with left columns.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      carry: Seq[(String, String)]): DataFrame = {
    val carried = carry.map(_._2)
    val l = left.select(
      left.columns.map(col).toSeq ++
        Seq(lit(1).as("__side"), col(leftTs).as("__ts")) ++
        carry.map { case (src, dst) =>
          lit(null).cast(right.schema(src).dataType).as(dst)
        }: _*)
    val r = right.select(
      Seq(col(key)) ++
        left.columns.filterNot(_ == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(0).as("__side"), col(rightTs).as("__ts")) ++
        carry.map { case (src, dst) => col(src).as(dst) }: _*)
    // right rows sort BEFORE left rows at equal timestamps (__side 0 < 1)
    // → a right row at exactly left-time is matched (inclusive ≤)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = carried.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__side", "__ts")
  }
}
