package graft

import org.apache.spark.sql.functions._

import graft.operators.Compress

/** [[graft.operators.Compress.deflateRatio]]: the redundancy gate —
  * repetition collapses the ratio while leaving char entropy alone,
  * NULL/empty degrade to keep = false, and the plan stays map-only
  * with the kernel inside whole-stage codegen.
  */
class CompressSpec extends SparkSpec {
  import spark.implicits._

  private val prose =
    "The quick brown fox jumps over the lazy dog while seventeen " +
      "violinists argue about breakfast pastries in the rain."

  test("repetition collapses the ratio; natural prose clears the floor") {
    val docs = Seq(
      (1L, prose),
      (2L, Seq.fill(6)(prose).mkString("\n")),
      (3L, "z" * 400)
    ).toDF("doc_id", "text")
    val got = Compress.deflateRatio(docs, "text", "doc_id", 2800L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    val (nb1, dz1, r1, k1) = got(1L)
    val (nb2, dz2, r2, k2) = got(2L)
    val (_, _, r3, k3) = got(3L)
    assert(nb1 === prose.getBytes("UTF-8").length.toLong)
    assert(nb2 === nb1 * 6 + 5)
    // six copies deflate to barely more than one copy's size
    assert(dz2 < dz1 * 2, s"dz1=$dz1 dz2=$dz2")
    assert(r2 < r1 / 2 && r3 < r1 / 2, s"r1=$r1 r2=$r2 r3=$r3")
    assert(k1 && !k2 && !k3)
    // ...while the CHARACTER distribution of the repeated doc is the
    // same as the original's — entropy cannot tell them apart, the
    // whole reason this operator exists next to q164
    val ent = graft.operators.Entropy
      .charEntropy(docs.filter($"doc_id" < 3), "text", "doc_id", 2600000L)
      .collect().map(r => r.getLong(0) ->
        r.getAs[Long]("entropy_micro")).toMap
    assert(math.abs(ent(1L) - ent(2L)) < 100000L,
      s"entropy should not separate repetition: $ent")
  }

  test("NULL and empty text degrade to keep = false, never a NULL row") {
    val docs = Seq((1L, null: String), (2L, "")).toDF("doc_id", "text")
    val got = Compress.deflateRatio(docs, "text", "doc_id", 2800L)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.isNullAt(3), r.getBoolean(4))).toSeq.sortBy(_._1)
    assert(got === Seq((1L, 0L, true, false), (2L, 0L, true, false)))
  }

  test("plan: map-only, kernel inside whole-stage codegen") {
    // parquet-backed input: a local Seq collapses to a LocalTableScan
    // (ConvertToLocalRelation evaluates the projection at optimize time)
    // and there would be no plan left to assert on
    val docs = Tables.documents(spark, sf0001)
    val df = Compress.deflateRatio(docs, "text", "doc_id", 2800L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert("""\*\(\d+\)""".r.findFirstIn(plan).isDefined,
      s"no codegen span:\n$plan")
  }
}
