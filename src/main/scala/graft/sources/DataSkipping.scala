package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Min/max data-skipping manifest — the file-statistics pruning layer a
  * 100 TB table lives or dies by. A scan with a range predicate should
  * read only the files whose [min, max] interval overlaps the
  * predicate; everything else is skipped from the MANIFEST alone
  * (a table ~6 orders of magnitude smaller than the data).
  *
  * Two granularities:
  *   - [[fileManifest]]: real files via `input_file_name()` — what a
  *     table-format transaction log stores per data file.
  *   - [[manifest]]: a caller-supplied chunk key (e.g. a time bucket or
  *     a [[graft.operators.ZOrder]] z-range) — the partition-pruning
  *     shape, and deterministic for oracle replay.
  *
  * Pruning correctness is an invariant, not a heuristic: kept chunks ⊇
  * chunks containing matches, so a pruned scan returns exactly the rows
  * of the full filter (spec-checked both on logical chunks and real
  * files).
  */
object DataSkipping {

  /** Per-chunk stats of `statCol`: (chunk, n_rows, mn, mx). One partial
    * aggregation — bytes shuffled are proportional to chunk count, not
    * data size. */
  def manifest(df: DataFrame, chunkCol: Column, statCol: Column): DataFrame =
    df.groupBy(chunkCol.as("chunk"))
      .agg(count(lit(1)).as("n_rows"), min(statCol).as("mn"), max(statCol).as("mx"))

  /** Real-file manifest (one row per parquet file of the scan).
    * `input_file_name()` is non-deterministic to Catalyst, so it must
    * be materialized as a column here (and by callers of [[prunedScan]]
    * that prune on it) — it cannot sit inside a join condition. */
  def fileManifest(df: DataFrame, statCol: Column): DataFrame =
    manifest(df.withColumn("graft_file", input_file_name()), col("graft_file"), statCol)

  /** Chunks whose [mn, mx] interval overlaps [lo, hi] — the ones a
    * pruned scan must read. */
  def keptChunks(manifestDf: DataFrame, lo: Column, hi: Column): DataFrame =
    manifestDf.filter(col("mx") >= lo && col("mn") <= hi)

  /** Scan `df` for `statCol` in [lo, hi] reading ONLY manifest-kept
    * chunks: the chunk filter is an IN over the (tiny, broadcast) kept
    * set and is pushed to the scan, so skipped chunks cost nothing. The
    * residual range filter removes in-chunk false positives. */
  def prunedScan(
      df: DataFrame, chunkCol: Column, statCol: Column,
      manifestDf: DataFrame, lo: Column, hi: Column): DataFrame = {
    // distinct alias: `df` may itself carry a column named "chunk"
    val kept = keptChunks(manifestDf, lo, hi).select(col("chunk").as("graft_kept_chunk"))
    df.join(broadcast(kept), chunkCol === col("graft_kept_chunk"), "left_semi")
      .filter(statCol >= lo && statCol <= hi)
  }
}
