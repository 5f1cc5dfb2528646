package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainMerges: Sennrich walk-through — es, est, lo in order") {
    // the classic worked example: low x5, lower x2, newest x6, widest x3
    val vocab = Seq(
      ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)
    ).toDF("w", "freq")
    val got = Bpe.trainMerges(vocab, "w", "freq", rounds = 3)
      .orderBy(col("round")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
      .toSeq
    // round 1: es = 9 (newest 6 + widest 3); st also 9, (e,s) < (s,t)
    // round 2: es+t = 9
    // round 3: l+o = 7 (low 5 + lower 2); o-w also 7, (l,o) < (o,w)
    assert(got == Seq(
      (1L, "e", "s", "es", 9L),
      (2L, "es", "t", "est", 9L),
      (3L, "l", "o", "lo", 7L)))
  }

  test("trainMerges: merge application is greedy left-to-right, aaa -> [aa, a]") {
    // one word 'aaaa' (freq 1) and one 'aaa' (freq 1): round 1 merges
    // (a,a) count 5 (3 pairs in aaaa + 2 in aaa); round 2's counts then
    // prove the rewrite was non-overlapping: aaaa -> aa|aa (one aa,aa
    // pair), aaa -> aa|a (one aa,a pair)
    val vocab = Seq(("aaaa", 1L), ("aaa", 1L)).toDF("w", "freq")
    val got = Bpe.trainMerges(vocab, "w", "freq", rounds = 2)
      .orderBy(col("round")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(4)))
      .toSeq
    assert(got.head == ((1L, "a", "a", 5L)))
    // after the rewrite the only pairs are (aa,aa) x1 and (aa,a) x1 —
    // tie breaks to lhs/rhs ascending: "aa" < "aa" equal, "a" < "aa"
    assert(got(1) == ((2L, "aa", "a", 1L)))
  }

  test("trainMerges: stops early when no pairs remain; 1-char words never pair") {
    val vocab = Seq(("ab", 3L), ("x", 9L)).toDF("w", "freq")
    val got = Bpe.trainMerges(vocab, "w", "freq", rounds = 5)
      .collect()
    // round 1 fuses (a,b); afterwards every word is a single symbol
    assert(got.map(r => (r.getLong(0), r.getString(3), r.getLong(4))).toSeq ==
      Seq((1L, "ab", 3L)))
  }

  test("encodeCounts: merges compress exactly the trained pairs, never across words") {
    // merges learned elsewhere: (a,b) then (ab,c)
    val merges = Seq(("a", "b"), ("ab", "c"))
    val docs = Seq(
      (1L, "abc ab"),     // abc -> [abc] (both merges chain), ab -> [ab] : 2 bpe
      (2L, "ba cab"),     // ba: no merge (order!) = 2; cab: c,ab = 2 : 4 bpe
      (3L, "a b"),        // boundary: 'a' and 'b' in DIFFERENT words never merge
      (4L, "")            // empty doc: 0/0, NULL ratio
    ).toDF("doc_id", "text")
    val got = Bpe.encodeCounts(docs, "text", "doc_id", merges)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)))).toSeq
    assert(got == Seq(
      (1L, 2L, 2L, Some(1.0)),
      (2L, 2L, 4L, Some(2.0)),
      (3L, 2L, 2L, Some(1.0)),
      (4L, 0L, 0L, None)))
  }

  test("trainMergesLocal == trainMerges on the Sennrich example and edge vocabs") {
    val vocabs = Seq(
      Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)),
      Seq(("aaaa", 1L), ("aaa", 1L)),            // overlapping-pair rewrite
      Seq(("ab", 3L), ("x", 9L)),                // early exhaustion
      Seq(("abab", 2L), ("bab", 1L), ("aabb", 4L)) // self-referential fuse
    )
    for (v <- vocabs) {
      val df = v.toDF("w", "freq")
      val dist = Bpe.trainMerges(df, "w", "freq", rounds = 6)
        .orderBy(col("round")).collect().toSeq
      val loc = Bpe.trainMergesLocal(df, "w", "freq", rounds = 6)
        .orderBy(col("round")).collect().toSeq
      assert(loc == dist, s"divergence on vocab $v")
    }
  }

  test("trainMergesLocal == trainMerges on random vocabularies (property)") {
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 5) {
      val vocab = (1 to 60).map { _ =>
        val len = 1 + rnd.nextInt(6)
        val w = (1 to len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
        (w, 1L + rnd.nextInt(9).toLong)
      }
      // duplicate words collapse through the caller's groupBy contract
      val df = vocab.toDF("w", "f").groupBy(col("w"))
        .agg(sum(col("f")).as("freq"))
      val dist = Bpe.trainMerges(df, "w", "freq", rounds = 10)
        .orderBy(col("round")).collect().toSeq
      val loc = Bpe.trainMergesLocal(df, "w", "freq", rounds = 10)
        .orderBy(col("round")).collect().toSeq
      assert(loc == dist, s"trial $trial diverged")
    }
  }

  test("encodeCountsScalable == encodeCounts under the trained-table invariant") {
    // fixed worked-example table plus trained tables over random corpora
    val fixedMerges = Seq(("a", "b"), ("ab", "c"))
    val docs = Seq(
      (1L, "abc ab"), (2L, "ba cab"), (3L, "a b"), (4L, ""),
      (5L, "abcabc aaa cba")
    ).toDF("doc_id", "text")
    val chain = Bpe.encodeCounts(docs, "text", "doc_id", fixedMerges)
      .orderBy(col("doc_id")).collect().toSeq
    val scal = Bpe.encodeCountsScalable(docs, "text", "doc_id", fixedMerges)
      .orderBy(col("doc_id")).collect().toSeq
    assert(scal == chain)

    val rnd = new scala.util.Random(77)
    for (trial <- 1 to 3) {
      val corpus = (1L to 40L).map { id =>
        val nw = 1 + rnd.nextInt(8)
        (id, (1 to nw).map(_ =>
          (1 to (1 + rnd.nextInt(6)))
            .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString).mkString(" "))
      }.toDF("doc_id", "text")
      val vocab = corpus
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      val merges = Bpe.trainMergesLocal(vocab, "w", "freq", rounds = 12)
        .orderBy(col("round")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val a = Bpe.encodeCounts(corpus, "text", "doc_id", merges)
        .orderBy(col("doc_id")).collect().toSeq
      val b = Bpe.encodeCountsScalable(corpus, "text", "doc_id", merges)
        .orderBy(col("doc_id")).collect().toSeq
      assert(a == b, s"trial $trial diverged on trained table $merges")
    }
  }

  test("encodedLen: heap encoder handles overlap and chained fusions") {
    val rank = Map(("a", "a") -> 0, ("aa", "a") -> 1)
    assert(Bpe.encodedLen("aaaa", rank) == 2)   // aa|aa
    assert(Bpe.encodedLen("aaa", rank) == 1)    // aa + a -> aaa
    assert(Bpe.encodedLen("a", rank) == 1)
    assert(Bpe.encodedLen("baab", rank) == 3)   // b|aa|b
    assert(Bpe.encodedLen("", rank) == 0)
  }

  test("trainMergesLocal: maxVocabRows guard fails fast") {
    val df = Seq(("low", 5L), ("newest", 6L)).toDF("w", "freq")
    intercept[IllegalArgumentException] {
      Bpe.trainMergesLocal(df, "w", "freq", rounds = 2, maxVocabRows = 1)
    }
  }

  test("q90 gate query runs and is deterministic at sf0.001") {
    val a = Queries.bpeTrain(spark, sf0001).collect().toSeq
    val b = Queries.bpeTrain(spark, sf0001).collect().toSeq
    assert(a == b)
    assert(a.size == 8)
    assert(a.map(_.getLong(0)) == (1L to 8L))
  }
}
