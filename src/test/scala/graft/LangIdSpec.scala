package graft

import org.apache.spark.sql.functions._

import graft.operators.LangId

/** [[graft.operators.LangId.scoreDocs]] — hashed char-trigram features
  * into frozen integer-logit language scores: exact, deterministic,
  * one doc-keyed shuffle.
  */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  test("charNgrams: normalized trigrams; short/null text yields an empty array") {
    val got = Seq(("  Hello   World ", 1L), ("ab", 2L), (null: String, 3L))
      .toDF("text", "id")
      .select(col("id"), LangId.charNgrams(col("text"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L).take(3) == Seq("hel", "ell", "llo"))
    assert(got(1L).contains("o w")) // spaces participate, collapsed to one
    assert(got(2L).isEmpty && got(3L).isEmpty)
  }

  test("scoreDocs: exact logits, deterministic argmax, margin, one row per doc") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "ab"), // too short for one trigram
      (3L, null: String),
      (4L, "zzz")) // exactly one gram -> all langs score that bucket
      .toDF("doc_id", "text")
    val out = LangId.scoreDocs(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(2L) == ((0L, "unknown", None, None)))
    assert(out(3L) == ((0L, "unknown", None, None)))
    val (n1, lang1, z1, m1) = out(1L)
    assert(n1 == 41L && z1.nonEmpty && m1.exists(_ >= 0L))
    assert(LangId.Langs.contains(lang1))
    // exact recompute of doc 4's single-gram logits on the driver:
    // bucket = hash60("zzz") mod 64, z_k = (bk*P_k + Q_k) mod 21 - 10
    val (n4, _, z4, _) = out(4L)
    assert(n4 == 1L && z4.exists(z => z >= -10L && z <= 10L))
    // partitioning must not move a single logit (long sums commute)
    val re = LangId.scoreDocs(docs.repartition(7), "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2)))).toMap
    assert(re == out.map { case (k, v) => k -> ((v._1, v._2)) })
  }

  test("scoreDocs plan: map-only — no explode, no join, no shuffle") {
    val docs = Seq((1L, "some text for the plan")).toDF("doc_id", "text")
    val plan = LangId.scoreDocs(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Generate"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("kernel path == explode path bit-for-bit (incl. multi-byte chars)") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "el rápido zorro marrón salta sobre el perro perezoso"),
      (3L, "héllo wörld çà ñandú 中文 テキスト"), // multi-byte slow path
      (4L, "ab"), (5L, null: String),
      (6L, "Zwölf Boxkämpfer jagen Viktor quer über den"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)), Option(r.get(4)))).sortBy(_._1).toSeq
    assert(rows(LangId.scoreDocs(docs, "text", "doc_id")) ==
      rows(LangId.scoreDocsViaExplode(docs, "text", "doc_id")))
    // the kernel itself vs the declarative composition, per bucket
    import org.apache.spark.sql.graft.{CharNgramBucketCounts, ColumnBridge}
    val m = graft.functions.TextFunctions.normalized(col("text"))
    val viaKernel = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), ColumnBridge.column(
        CharNgramBucketCounts(ColumnBridge.expression(m), 3, 64)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaExplode = docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(LangId.charNgrams(col("text"), 3)).as("g"))
      .select(col("doc_id"),
        pmod(graft.functions.TextFunctions.stableHash60(col("g")),
          lit(64)).as("bk"))
      .groupBy(col("doc_id"), col("bk")).count()
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        val a = Array.fill(64)(0L)
        rs.foreach(r => a(r.getLong(1).toInt) = r.getLong(2))
        id -> a.toSeq
      }
    viaExplode.foreach { case (id, want) =>
      assert(viaKernel(id) == want, s"doc $id")
    }
  }
}
