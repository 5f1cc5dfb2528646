package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Iterated BPE merge training (Sennrich et al. 2016, arXiv:1508.07909) —
  * the loop around the single pair-count pass of `Queries.bpeMergeStats`:
  * per round, count adjacent symbol pairs over the VOCABULARY (weighted
  * by word frequency), take the most frequent pair, fuse it into one
  * symbol everywhere, repeat. The learned merge table IS the tokenizer.
  *
  * Scale shape (the reason every BPE trainer aggregates to the
  * vocabulary first): the corpus prices exactly ONE corpus-sized
  * shuffle — the word-frequency aggregation the caller supplies — and
  * the training loop touches only the vocab, whose size is bounded by
  * the language, not the data; 100 TB of text trains against the same
  * ~10M-row frame as 1 GB. The vocab is checkpointed once and each
  * round is a single Spark job (pair explode → one partial-agged
  * shuffle → TakeOrdered(1)); merges apply lazily as stacked
  * `replace`s over the checkpoint, so round i re-runs i cheap string
  * rewrites rather than materializing a new vocab per round — for
  * round counts in the thousands, checkpoint every ~32 rounds to cap
  * the restack (same driver-bounded-state discipline as
  * [[Similarity.kmeansTrain]]: the driver holds the merge table, never
  * data).
  *
  * Symbol sequences ride in ONE string column with every symbol
  * individually wrapped in U+001F (unit separator): `"ab" + "c"` ⇢
  * `␟ab␟␟c␟`. Two properties make this the right encoding:
  * the wrapped search key `␟l␟␟r␟` can only match at symbol
  * boundaries (no mid-symbol hit: `b␟␟c` inside `␟ab␟␟c␟` is not
  * preceded by `␟b`), and `replace`'s left-to-right non-overlapping
  * scan is EXACTLY the BPE merge rule (`aaaa` under merge (a,a) →
  * `aa aa`; `aaa` → `aa a`) — each occurrence consumes its own
  * wrapping, so adjacent matches don't steal each other's boundary.
  * Words containing the separator are excluded up front (they cannot
  * be represented; a production trainer would escape instead).
  *
  * No end-of-word marker: merges never cross words here (pair counting
  * is per-word), which drops Sennrich's `</w>` distinction between
  * word-final and word-internal symbols — a documented simplification,
  * not an accident.
  */
object Bpe {

  private[graft] val Sep = "\u001f"

  private val outSchema = StructType(Seq(
    StructField("round", LongType, nullable = false),
    StructField("lhs", StringType, nullable = false),
    StructField("rhs", StringType, nullable = false),
    StructField("merged", StringType, nullable = false),
    StructField("pair_count", LongType, nullable = false)))

  /** Wrapped-symbol initial sequence of a word: every character becomes
    * one wrapped symbol.
    */
  private def initialSeq(word: org.apache.spark.sql.Column) =
    regexp_replace(word, "(.)", Sep + "$1" + Sep)

  /** Symbol array of a wrapped sequence (strip the outer wraps, split on
    * the doubled boundary).
    */
  private def symbolsOf(seq: org.apache.spark.sql.Column) =
    split(trim(seq, Sep), java.util.regex.Pattern.quote(Sep + Sep))

  /** Train `rounds` merges over a `(wordCol, freqCol)` vocabulary frame.
    *
    * Returns (round, lhs, rhs, merged, pair_count), one row per merge in
    * training order — round is 1-based; `merged = lhs || rhs`. Ties on
    * pair_count break lexicographically (lhs, then rhs), so training is
    * deterministic across runs and engines. Stops early if the vocab
    * runs out of adjacent pairs.
    */
  def trainMerges(
      vocab: DataFrame,
      wordCol: String,
      freqCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, "trainMerges: rounds must be >= 1")
    val s = vocab.sparkSession
    // the ONE vocab materialization; excludes unrepresentable words
    var seqs = vocab
      .filter(!col(wordCol).contains(Sep))
      .select(initialSeq(col(wordCol)).as("seq"),
        col(freqCol).cast("long").as("freq"))
      .localCheckpoint(eager = true)
    val merges = Seq.newBuilder[Row]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val syms = symbolsOf(col("seq"))
      // adjacent pairs via two shifted slices (slice of a 1-symbol word
      // is empty, so short words drop out without a sequence(1,0) guard)
      val top = seqs
        .select(col("freq"),
          explode(zip_with(
            slice(syms, lit(1), size(syms) - 1),
            slice(syms, lit(2), size(syms) - 1),
            (a, b) => struct(a.as("lhs"), b.as("rhs")))).as("pr"))
        .groupBy(col("pr.lhs").as("lhs"), col("pr.rhs").as("rhs"))
        .agg(sum(col("freq")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("lhs").asc, col("rhs").asc)
        .limit(1)
        .collect()
      top.headOption match {
        case None => exhausted = true
        case Some(r: Row) =>
          val (l, rr, n) = (r.getString(0), r.getString(1), r.getLong(2))
          merges += Row(round.toLong, l, rr, l + rr, n)
          seqs = seqs.withColumn("seq",
            replace(col("seq"),
              lit(Sep + l + Sep + Sep + rr + Sep), lit(Sep + l + rr + Sep)))
          round += 1
      }
    }
    s.createDataFrame(
      s.sparkContext.parallelize(merges.result(), 1), outSchema)
  }

  /** VOCABULARY-RESIDENT merge training — the production path for real
    * merge counts (a 32k-merge tokenizer), byte-identical in output to
    * [[trainMerges]] (property-asserted in BpeSpec).
    *
    * [[trainMerges]] prices one Spark job PER ROUND (pair explode →
    * shuffle → TakeOrdered(1) → driver round-trip) plus a lineage
    * restack per merge: correct, but 32k merges means 32k sequential
    * jobs — scheduler latency alone dominates. This is the shape every
    * production BPE trainer (Sennrich's reference impl, HuggingFace
    * tokenizers, SentencePiece) uses instead: the cluster does the ONE
    * corpus-sized shuffle (word-frequency aggregation, supplied by the
    * caller), then the vocabulary — bounded by the language (~1e6–1e7
    * distinct words at ANY corpus size), not the data — collects to the
    * driver and the whole merge loop runs locally with incremental
    * pair-count maintenance:
    *
    *   - `counts` maps each adjacent symbol pair to its frequency-
    *     weighted count; a lazy max-heap (count desc, lhs asc, rhs asc
    *     — the same tie order as the distributed TakeOrdered) yields
    *     each round's winner in O(log P); stale heap entries are
    *     discarded on pop by revalidating against `counts`.
    *   - an inverted index pair → word-ids bounds each round's rewrite
    *     to the words that actually contain the winning pair; their
    *     pair multisets are diffed (old vs merged) so `counts` updates
    *     are exact and O(Σ affected word lengths), not a vocab scan.
    *
    * Total work is O(Σ|word| + rounds · avg-affected), seconds for 32k
    * merges on a 1e6-word vocabulary — vs 32k cluster jobs. Merge
    * application is the same left-to-right non-overlapping scan as
    * `replace` on the wrapped encoding (`aaaa` under (a,a) → `aa aa`),
    * and pair counting counts overlapping adjacencies (`aaa` → (a,a)
    * twice), so every round picks exactly the pair the distributed
    * loop would.
    *
    * `maxVocabRows` guards the collect: a vocabulary past the driver's
    * budget fails fast with a pointer to [[trainMerges]] (which has no
    * driver-memory bound, just per-round job latency).
    */
  def trainMergesLocal(
      vocab: DataFrame,
      wordCol: String,
      freqCol: String,
      rounds: Int,
      maxVocabRows: Int = 20000000): DataFrame = {
    require(rounds >= 1, "trainMergesLocal: rounds must be >= 1")
    val s = vocab.sparkSession
    val rows = vocab
      .filter(!col(wordCol).contains(Sep))
      .select(col(wordCol).cast("string"), col(freqCol).cast("long"))
      .limit(maxVocabRows + 1)
      .collect()
    require(rows.length <= maxVocabRows,
      s"trainMergesLocal: vocabulary exceeds maxVocabRows=$maxVocabRows " +
        "— raise the bound or fall back to the distributed trainMerges")

    // one entry per word: mutable symbol array (starts as code points)
    val words = rows.map { r =>
      (r.getString(0).codePoints().toArray.map(Character.toString),
        r.getLong(1))
    }

    def pairBag(syms: Array[String]): collection.mutable.HashMap[(String, String), Long] = {
      val m = collection.mutable.HashMap.empty[(String, String), Long]
      var i = 0
      while (i + 1 < syms.length) {
        val k = (syms(i), syms(i + 1))
        m.update(k, m.getOrElse(k, 0L) + 1L)
        i += 1
      }
      m
    }

    val counts = collection.mutable.HashMap.empty[(String, String), Long]
    val index =
      collection.mutable.HashMap.empty[(String, String), collection.mutable.HashSet[Int]]
    words.zipWithIndex.foreach { case ((syms, freq), wi) =>
      pairBag(syms).foreach { case (k, n) =>
        counts.update(k, counts.getOrElse(k, 0L) + n * freq)
        index.getOrElseUpdate(k, collection.mutable.HashSet.empty) += wi
      }
    }

    // max-heap: count desc, then lhs asc, rhs asc (ties resolve to the
    // lexicographically smallest pair — identical to the distributed
    // orderBy(count.desc, lhs.asc, rhs.asc).limit(1))
    implicit val ord: Ordering[(Long, String, String)] =
      (a: (Long, String, String), b: (Long, String, String)) =>
        if (a._1 != b._1) java.lang.Long.compare(a._1, b._1)
        else {
          val c = b._2.compareTo(a._2)
          if (c != 0) c else b._3.compareTo(a._3)
        }
    val heap = collection.mutable.PriorityQueue.empty[(Long, String, String)]
    counts.foreach { case ((l, r), n) => heap.enqueue((n, l, r)) }

    def applyMergeTo(syms: Array[String], l: String, r: String,
        merged: String): Array[String] = {
      val out = collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += merged; i += 2 // scan resumes AFTER the fused symbol,
        } else { out += syms(i); i += 1 } // exactly like string replace
      }
      out.toArray
    }

    val merges = Seq.newBuilder[Row]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      // lazy-deletion pop: discard entries whose count is stale (every
      // count change pushed a fresh entry, so the live value is present)
      var best: Option[(Long, String, String)] = None
      while (best.isEmpty && heap.nonEmpty) {
        val e = heap.dequeue()
        if (counts.getOrElse((e._2, e._3), 0L) == e._1 && e._1 > 0L)
          best = Some(e)
      }
      best match {
        case None => exhausted = true
        case Some((n, l, r)) =>
          val merged = l + r
          merges += Row(round.toLong, l, r, merged, n)
          val touched = index.getOrElse((l, r),
            collection.mutable.HashSet.empty[Int]).toArray
          touched.foreach { wi =>
            val (syms, freq) = words(wi)
            val before = pairBag(syms)
            if (before.contains((l, r))) { // index entries can be stale
              val after0 = applyMergeTo(syms, l, r, merged)
              words(wi) = (after0, freq)
              val after = pairBag(after0)
              (before.keySet ++ after.keySet).foreach { k =>
                val delta = after.getOrElse(k, 0L) - before.getOrElse(k, 0L)
                if (delta != 0L) {
                  val nv = counts.getOrElse(k, 0L) + delta * freq
                  if (nv == 0L) counts.remove(k)
                  else { counts.update(k, nv); heap.enqueue((nv, k._1, k._2)) }
                }
                if (after.contains(k))
                  index.getOrElseUpdate(k,
                    collection.mutable.HashSet.empty) += wi
              }
            }
          }
          index.remove((l, r))
          round += 1
      }
    }
    s.createDataFrame(
      s.sparkContext.parallelize(merges.result(), 1), outSchema)
  }

  /** Word boundary for [[encodeCounts]]' document sequences: words join
    * on U+001E (record separator), which contains no U+001F — so a
    * merge's wrapped search key can never straddle two words.
    */
  private val WordSep = "\u001e"

  /** ENCODE under a trained merge table — the serving half of
    * [[trainMerges]]: every word's characters wrapped as symbols, the
    * merges applied in training order (each one `replace` — the same
    * left-to-right rule as training), and the per-doc symbol count read
    * off the wrap characters. One map pass over the corpus, merge table
    * as literals; at a production vocabulary (~30k merges) the stacked
    * `replace` chain becomes a codegen'd expression pipeline of depth
    * |merges| — split it across a few projections if Janino balks, the
    * data never shuffles either way.
    *
    * Output: (idCol, n_ws_tokens, n_bpe_tokens, tokens_per_word) —
    * whitespace-token count, trained-tokenizer symbol count, and their
    * 4-dp ratio (NULL for empty docs). Corpus contract: text carries no
    * U+001F/U+001E (the driver corpus is clean; escape at ingest
    * otherwise).
    */
  def encodeCounts(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val toks = graft.functions.TextFunctions.tokens(col(textCol))
    val wrapped = array_join(
      transform(toks, w => regexp_replace(w, "(.)", Sep + "$1" + Sep)),
      WordSep)
    val seq0 = docs.select(col(idCol), wrapped.as("seq"),
      size(filter(toks, t => t =!= "")).cast("long").as("n_ws_tokens"))
    val seqN = merges.foldLeft(seq0) { case (df, (l, r)) =>
      df.withColumn("seq",
        replace(col("seq"),
          lit(Sep + l + Sep + Sep + r + Sep), lit(Sep + l + r + Sep)))
    }
    val nBpe = ((length(col("seq")) -
      length(replace(col("seq"), lit(Sep), lit("")))) / 2).cast("long")
    seqN.select(col(idCol), col("n_ws_tokens"), nBpe.as("n_bpe_tokens"))
      .withColumn("tokens_per_word",
        expr("round(n_bpe_tokens / nullif(n_ws_tokens, 0), 4)"))
  }

  /** Encoded symbol count of ONE word under a rank table — the
    * standard linked-list BPE encoder (the algorithm inside every
    * production tokenizer runtime): symbols as a doubly-linked list,
    * a min-heap of (rank, position) merge candidates with lazy
    * invalidation, each pop fuses the lowest-rank leftmost applicable
    * pair and offers the two newly-adjacent pairs. O(|word| log |word|)
    * regardless of merge-table size — only pairs PRESENT in the word
    * ever enter the heap.
    *
    * For merge tables produced by training (each merge's operands are
    * single characters or outputs of STRICTLY EARLIER merges — true of
    * [[trainMerges]]/[[trainMergesLocal]] by construction), min-rank
    * order is provably identical to applying the merges in training
    * order with one left-to-right pass each, i.e. to [[encodeCounts]]'
    * replace chain (spec-asserted on trained tables): an adjacency for
    * merge i can only be created by a merge j < i (the producer of its
    * operand), and a merge can never produce its own operand
    * (`l + r != l`), so the heap exhausts every rank before the next
    * one starts, left-to-right within a rank via the position key.
    */
  private[graft] def encodedLen(
      word: String,
      rank: collection.Map[(String, String), Int]): Int = {
    val chars = word.codePoints().toArray.map(Character.toString)
    val n = chars.length
    if (n <= 1) return n
    val cap = 2 * n // each fusion adds 1 node, kills 2 → ≤ 2n-1 total
    val sym = new Array[String](cap)
    val prev = new Array[Int](cap)
    val next = new Array[Int](cap)
    val alive = new Array[Boolean](cap)
    val posKey = new Array[Int](cap)
    var i = 0
    while (i < n) {
      sym(i) = chars(i); prev(i) = i - 1
      next(i) = if (i == n - 1) -1 else i + 1
      alive(i) = true; posKey(i) = i
      i += 1
    }
    var free = n
    var live = n
    // min-heap on (rank, posKey): lowest rank first, leftmost within it
    val heap = collection.mutable.PriorityQueue.empty[(Int, Int, Int)](
      Ordering.by((t: (Int, Int, Int)) => (t._1, t._2)).reverse)
    def offer(u: Int): Unit = {
      val v = next(u)
      if (v != -1) rank.get((sym(u), sym(v)))
        .foreach(r => heap.enqueue((r, posKey(u), u)))
    }
    i = 0
    while (i < n - 1) { offer(i); i += 1 }
    while (heap.nonEmpty) {
      val (rk, _, u) = heap.dequeue()
      if (alive(u)) {
        val v = next(u)
        // lazy invalidation: the pair at u may have changed since this
        // entry was pushed — act only if it still has exactly this rank
        // (any other live pair here pushed its own entry on formation)
        if (v != -1 && rank.get((sym(u), sym(v))).contains(rk)) {
          val w = free; free += 1
          sym(w) = sym(u) + sym(v); posKey(w) = posKey(u)
          prev(w) = prev(u); next(w) = next(v)
          if (prev(w) != -1) next(prev(w)) = w
          if (next(w) != -1) prev(next(w)) = w
          alive(u) = false; alive(v) = false; alive(w) = true
          live -= 1
          if (prev(w) != -1) offer(prev(w))
          offer(w)
        }
      }
    }
    live
  }

  /** [[encodeCounts]] at PRODUCTION merge-table scale: same output
    * frame, but the merge table ships to executors ONCE as a broadcast
    * rank map and each word is encoded by the [[encodedLen]] linked-
    * list encoder. The replace-chain variant compiles one codegen'd
    * `replace` per merge — the right shape at the gate's 8 merges, a
    * |merges|-deep expression pipeline at a 32k-merge vocabulary
    * (codegen size grows with the TABLE, and every row pays a scan per
    * merge whether or not it applies). Here per-row work is
    * O(len · log len) independent of merge-table size, and only the
    * rank lookup touches the table. Still one map pass, no shuffle; the
    * UDF boundary costs codegen fusion on this projection — the right
    * trade once the table outgrows an expression chain. Unlike the
    * chain, text containing U+001F/U+001E needs no escape contract
    * (there is no in-band string encoding at all).
    */
  def encodeCountsScalable(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    // first occurrence of a duplicated pair wins (a later re-merge of
    // the same pair is a no-op in the chain semantics)
    val rank: Map[(String, String), Int] =
      merges.zipWithIndex.reverse.map { case (p, i) => p -> i }.toMap
    val s = docs.sparkSession
    val bc = s.sparkContext.broadcast(rank)
    val enc = udf((words: Seq[String]) => {
      val mr = bc.value
      var total = 0L
      if (words != null) words.foreach { w =>
        if (w != null && w.nonEmpty) total += encodedLen(w, mr)
      }
      total
    })
    val toks = graft.functions.TextFunctions.tokens(col(textCol))
    docs.select(col(idCol),
        size(filter(toks, t => t =!= "")).cast("long").as("n_ws_tokens"),
        enc(toks).as("n_bpe_tokens"))
      .withColumn("tokens_per_word",
        expr("round(n_bpe_tokens / nullif(n_ws_tokens, 0), 4)"))
  }
}
