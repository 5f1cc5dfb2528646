package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Encoding-damage (mojibake) detection — the charset-repair TRIAGE
  * stage of a web-crawl pipeline (the ftfy problem): UTF-8 bytes
  * decoded as Latin-1/Windows-1252 leave fingerprint digraphs
  * (`Ã©` for é, `â€™` for ’, `Â ` for a non-breaking space), and
  * decode failures leave U+FFFD replacement characters. A curation
  * pipeline counts these BEFORE quality scoring — damaged text
  * depresses every downstream signal (language ID, perplexity,
  * entropy) for reasons repair would fix, so triage must be its own
  * column, not folded into quality.
  *
  * Detection is pattern-based over the DOCUMENTED artifact set below —
  * honest scope (the PSL-snapshot discipline): these are the
  * high-precision cp1252-mojibake digraphs of the Latin-script web
  * plus the replacement character; a deployment extends the pattern
  * for its corpus. All counts are non-overlapping left-to-right regex
  * matches, identical in Java regex and RE2.
  *
  * Scale shape: MAP-ONLY — two `regexp_count` probes per document on
  * the ingest scan, zero shuffle, one row per document.
  */
object Mojibake {

  /** cp1252-mojibake digraphs: `Ã`+accented-letter tail (é è ê ë ¯ ± «
    * » © ¼ ª º etc. mis-decodes), `â€`+punctuation tail (’ ‘ “ ” – —
    * mis-decodes), `Â ` (doubled non-breaking space).
    */
  val MojibakePattern: String =
    "Ã[©¨ª«¯±³µ¶º¼½¾‰€™“”]|â€[™œ¦˜“”]|Â[ \u00A0®©«»]"

  /** Decode-failure marker: U+FFFD. */
  val ReplacementPattern: String = "�"

  /** Per-document damage report: (`idCol`, n_chars, moji_hits,
    * repl_chars, moji_pp10k [hits per 10k chars, floor; NULL for
    * charless docs], clean). One row per document.
    */
  def score(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    docs.select(col(idCol),
      length(t).cast("long").as("n_chars"),
      regexp_count(t, lit(MojibakePattern)).cast("long").as("moji_hits"),
      regexp_count(t, lit(ReplacementPattern)).cast("long")
        .as("repl_chars"))
      .withColumn("moji_pp10k",
        when(col("n_chars") > 0,
          expr("((moji_hits + repl_chars) * 10000) div n_chars")))
      .withColumn("clean",
        col("moji_hits") === 0 && col("repl_chars") === 0)
  }
}
