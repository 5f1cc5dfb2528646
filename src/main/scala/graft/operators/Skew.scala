package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for joins whose key distribution is heavy-
  * tailed (one hot key ⇒ one straggler task at cluster scale).
  *
  * Spark's AQE skew-join handles SORT-MERGE join skew automatically at
  * runtime; salting remains necessary when (a) the skewed side feeds a
  * broadcast-impossible shuffled hash join, (b) the skew is in a groupBy
  * (AQE does not split aggregation keys), or (c) AQE is disabled (streaming
  * micro-batches).
  */
object Skew {

  /** Salted equi-join: replicate each `right` row `salt` times with a salt
    * id; spray `left` rows uniformly across salts; join on (key, salt).
    * The hot key's rows land on `salt` tasks instead of one. Correct for
    * inner and left joins (each left row matches exactly one replica set).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 1, "salt must be > 1")
    // Replicating the RIGHT side is only correct when unmatched right rows
    // are never emitted: a right/full outer join would emit each unmatched
    // right row `salt` times. Reject those join types outright.
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "semi",
      "leftanti", "anti").contains(jt),
      s"saltedJoin: joinType '$joinType' unsupported — right-row-emitting " +
        "join types would duplicate unmatched right rows once per salt")
    val l = left.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)).cast("int"))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial-aggregate on (key, salt) then
    * final-aggregate on key. Use for algebraic aggregates (sum/count/min/
    * max) over keys too hot for one reducer. (Spark's partial aggregation
    * already map-side combines; this additionally splits the REDUCE side of
    * a single hot key across `salt` reducers.)
    */
  def saltedSumCount(
      df: DataFrame,
      key: String,
      valueCol: String,
      salt: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)).cast("int"))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("n"))
  }
}
