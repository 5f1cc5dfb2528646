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

  test("int8 quantization: codes bounded, roundtrip error ≤ scale/2, zeros safe") {
    val emb = Tables.embeddings(spark, sf0001).limit(100)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("qs", quantizeInt8(col("v")))
      .withColumn("back", dequantizeInt8(col("qs")))
    val bad = emb.select(
        col("qs.scale").as("scale"),
        array_max(zip_with(col("v"), col("back"), (x, y) => abs(x - y))).as("maxErr"),
        array_max(transform(col("qs.q"), c => abs(c.cast("int")))).as("maxCode"))
      .filter(col("maxErr") > col("scale") / 2 + lit(1e-12) || col("maxCode") > 127)
      .count()
    assert(bad == 0L)
    // all-zero vector: scale 0, zero codes, lossless roundtrip
    val z = pair(Seq(0.0, 0.0), Seq(0.0, 0.0))
      .withColumn("qs", quantizeInt8(col("a")))
    val r = z.select(col("qs.scale"), dequantizeInt8(col("qs")).as("back")).head()
    assert(r.getDouble(0) == 0.0 && r.getSeq[Double](1) == Seq(0.0, 0.0))
  }
}
