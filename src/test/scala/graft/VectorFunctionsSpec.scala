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

  test("vectorDecimalSum is bit-identical to posexplode + decimal(38,12) sums") {
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("label"), asDouble(col("embedding")).as("v"))
      .repartition(7) // exercise partial merge + serialization across tasks
    val viaAgg = emb.groupBy(col("label"))
      .agg(vectorDecimalSum(col("v")).as("sv"))
      .select(col("label"), posexplode(col("sv")).as(Seq("d0", "sx")))
    val viaExplode = emb
      .select(col("label"), posexplode(col("v")).as(Seq("d0", "x")))
      .groupBy(col("label"), col("d0"))
      .agg(sum(col("x").cast("decimal(38,12)")).as("sx"))
    // exact join on the decimal VALUE: any ulp/rounding divergence drops rows
    assert(viaAgg.count() > 0)
    assert(viaAgg.join(viaExplode, Seq("label", "d0", "sx"), "anti").count() == 0L)
    assert(viaExplode.join(viaAgg, Seq("label", "d0", "sx"), "anti").count() == 0L)
  }

  test("vectorDecimalSum guards: dim change and overflow-domain elements fail loudly") {
    val mixed = Seq((1L, Seq(1.0, 2.0)), (1L, Seq(1.0, 2.0, 3.0))).toDF("g", "v")
    val e1 = intercept[Exception] {
      mixed.groupBy(col("g")).agg(vectorDecimalSum(col("v"))).collect()
    }
    assert(e1.getMessage.contains("dimension") ||
      e1.getCause != null && e1.getCause.getMessage.contains("dimension"))
    val big = Seq((1L, Seq(1.0e7))).toDF("g", "v")
    val e2 = intercept[Exception] {
      big.groupBy(col("g")).agg(vectorDecimalSum(col("v"))).collect()
    }
    assert(e2.getMessage.contains("exact-sum domain") ||
      e2.getCause != null && e2.getCause.getMessage.contains("exact-sum domain"))
  }

  test("CosineMaxHits kernel matches the HOF max/hits fold bit-for-bit") {
    import org.apache.spark.sql.graft.{ColumnBridge, CosineMaxHits}
    val tau = 0.35
    val emb = Tables.embeddings(spark, sf0001)
    val evalDf = emb.filter(pmod(col("vec_id"), lit(19)) === 3)
    val corpus = emb.filter(pmod(col("vec_id"), lit(19)) =!= 3)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val evVecs = evalDf.select(asDouble(col("embedding")).as("e")).collect()
      .map(_.getSeq[Double](0).toArray)
    val evNorms = evVecs.map(CosineMaxHits.norm)
    val kernel = corpus.select(col("vec_id"),
      ColumnBridge.column(CosineMaxHits(
        ColumnBridge.expression(col("v")), evVecs, evNorms, tau)).as("f"))
      .select(col("vec_id"), col("f.mx").as("mx"), col("f.hits").as("hits"))
    // reference: the HOF fold this kernel replaced, evaluated per pair
    val evRow = evalDf
      .agg(collect_list(asDouble(col("embedding"))).as("ev"))
    val reference = corpus.crossJoin(broadcast(evRow))
      .select(col("vec_id"), aggregate(
        col("ev"),
        struct(lit(-2.0).as("mx"), lit(0L).as("hits")),
        (acc, e) => {
          val c = round(cosine(col("v"), e), 6)
          val safe = when(!isnan(c), c).otherwise(lit(-2.0))
          struct(
            greatest(acc.getField("mx"), safe).as("mx"),
            (acc.getField("hits") +
              when(safe >= tau, 1L).otherwise(0L)).as("hits"))
        }).as("f"))
      .select(col("vec_id"), col("f.mx").as("mx"), col("f.hits").as("hits"))
    assert(kernel.count() > 0)
    assert(kernel.join(reference, Seq("vec_id", "mx", "hits"), "anti").count() == 0L)
  }
}
