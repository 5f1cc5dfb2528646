package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def pair(a: Seq[Double], b: Seq[Double]) = Seq((a, b)).toDF("a", "b")

  test("dot / norm / cosine on known vectors") {
    val df = pair(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))
    val row = df.select(
      dot(col("a"), col("b")).as("d"),
      norm(col("a")).as("na"),
      cosine(col("a"), col("b")).as("c"),
      l2sq(col("a"), col("b")).as("l2")).head()
    assert(row.getAs[Double]("d") == 32.0)
    assert(math.abs(row.getAs[Double]("na") - math.sqrt(14.0)) < 1e-12)
    assert(math.abs(row.getAs[Double]("c") - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12)
    assert(row.getAs[Double]("l2") == 27.0)
  }

  test("codegen ArrayDot is bit-identical to the HOF fold on real embeddings") {
    val emb = Tables.embeddings(spark, sf0001).limit(50)
      .select(asDouble(col("embedding")).as("v"))
    val a = emb.as("a")
    val b = emb.as("b")
    val diffs = a.crossJoin(b)
      .select((dot(col("a.v"), col("b.v")) =!= dotFold(col("a.v"), col("b.v"))).as("ne"))
      .filter(col("ne")).count()
    assert(diffs == 0L)
  }

  test("cosine of identical vectors = 1; zero vector → 0 (guard, not NaN)") {
    val df1 = pair(Seq(1.0, 1.0), Seq(1.0, 1.0))
    assert(math.abs(df1.select(cosine(col("a"), col("b"))).head().getDouble(0) - 1.0) < 1e-12)
    val df0 = pair(Seq(0.0, 0.0), Seq(1.0, 1.0))
    assert(df0.select(cosine(col("a"), col("b"))).head().getDouble(0) == 0.0)
  }
}
