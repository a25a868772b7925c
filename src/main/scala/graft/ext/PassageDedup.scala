package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Repeated-passage removal with document reconstruction — the
  * substring-level deduplication of Lee et al.'s "Deduplicating
  * Training Data Makes Language Models Better", approximated at fixed
  * token-chunk granularity (the way it is actually deployed on
  * corpora too big for suffix arrays): documents split into
  * consecutive `w`-token chunks, each chunk kept only at its first
  * corpus occurrence (min (doc_id, pos)), and every document rebuilt
  * from its surviving chunks. Unlike whole-doc dedup (q18) or near-dup
  * removal (q20), this deletes the COPIED PASSAGE INSIDE otherwise
  * distinct documents — boilerplate headers, licence blocks, quoted
  * chain-mails.
  *
  * Scale design: one explode (docs × chunks-per-doc), one shuffle on
  * the chunk text for the first-occurrence window, one shuffle back on
  * doc_id for reassembly. Chunk text could be replaced by its 16-byte
  * digest to cut shuffle width (same trick as [[Dedup]]); kept as text
  * here so the oracle mirrors strings directly.
  */
object PassageDedup {

  /** (id, pos, chunk): consecutive `w`-token chunks (trailing partial
    * chunk included; empty/blank text yields no rows). */
  def chunked(df: DataFrame, idCol: String, textCol: String, w: Int): DataFrame = {
    // tokens bound to a COLUMN before the chunk lambda — an inline
    // tokens expression would be re-inlined into every slice() of the
    // transform (no subexpression elimination inside Generate), so
    // each chunk re-splits the whole document (the SurprisalScore
    // bigram lesson)
    val toks = col("__t")
    val chunks = when(size(toks) === 0, array().cast("array<string>"))
      .otherwise(transform(
        // Column `/` is double division; the cast truncates = floor
        // (operands are non-negative small ints, so it is exact)
        sequence(lit(0), ((size(toks) + (w - 1)) / w).cast("int") - 1),
        i => array_join(slice(toks, i * w + 1, lit(w)), " ")))
    df.select(col(idCol).as("id"),
        graft.functions.TextFunctions.tokens(col(textCol)).as("__t"))
      .select(col("id"), posexplode(chunks).as(Seq("pos", "chunk")))
      .select(col("id"), col("pos").cast("long").as("pos"), col("chunk"))
  }

  /** Dedup + rebuild. Output, one row per input document:
    * (id, n_chunks, n_kept, new_len, new_md5) where new_* describe the
    * text rebuilt from surviving chunks (empty string if every chunk of
    * the doc was a repeat). */
  def dedupRebuild(df: DataFrame, idCol: String, textCol: String, w: Int): DataFrame = {
    val occ = chunked(df, idCol, textCol, w)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val first = Window.partitionBy(col("chunk")).orderBy(col("id"), col("pos"))
    val kept = occ.withColumn("rn", row_number().over(first)).filter(col("rn") === 1)
    val rebuilt = kept.groupBy(col("id")).agg(
      count(lit(1)).as("n_kept"),
      array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("chunk")))),
          s => s("chunk")),
        " ").as("txt"))
    val totals = occ.groupBy(col("id")).agg(count(lit(1)).as("n_chunks"))
    df.select(col(idCol).as("id"))
      .join(totals, Seq("id"), "left")
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        length(coalesce(col("txt"), lit(""))).cast("long").as("new_len"),
        md5(coalesce(col("txt"), lit(""))).as("new_md5"))
  }
}
