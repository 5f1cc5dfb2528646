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
    val clash = (carried :+ "__side" :+ "__ts" :+ "__carry")
      .filter(left.columns.toSet)
    require(clash.isEmpty,
      s"asofJoin: output/internal names clash with left columns: ${clash.mkString(",")}")
    require(carried.distinct.size == carried.size,
      "asofJoin: duplicate carry output names")
    // All carry columns travel as ONE struct: the struct is non-null for
    // every right row even when individual fields are null, so the window's
    // last(..., ignoreNulls) selects the MATCHED row's struct and nulls
    // inside it are preserved (per-column fill would leak older rows'
    // values into the matched row's null fields).
    val carryType = org.apache.spark.sql.types.StructType(carry.map {
      case (src, dst) =>
        org.apache.spark.sql.types.StructField(dst, right.schema(src).dataType)
    })
    val l = left.select(
      left.columns.map(col).toSeq ++
        Seq(lit(1).as("__side"), col(leftTs).as("__ts"),
          lit(null).cast(carryType).as("__carry")): _*)
    val r = right.select(
      Seq(col(key)) ++
        left.columns.filterNot(_ == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(0).as("__side"), col(rightTs).as("__ts"),
          struct(carry.map { case (src, dst) => col(src).as(dst) }: _*)
            .as("__carry")): _*)
    // right rows sort BEFORE left rows at equal timestamps (__side 0 < 1)
    // → a right row at exactly left-time is matched (inclusive ≤)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .withColumn("__carry", last(col("__carry"), ignoreNulls = true).over(w))
    filled.filter(col("__side") === 1)
      .select(left.columns.map(col).toSeq ++
        carried.map(c => col("__carry").getField(c).as(c)): _*)
  }
}
