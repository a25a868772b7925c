package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.CoreOps

/** Ingestion façade (SURVEY.md §2.1 S1-S5) — format dispatch by
  * extension, per-format validation matching the reference's parser
  * error branches (`/root/reference/main.py:78-285`), all re-expressed
  * as Spark sources so ingest scales out (no 10 MB cap, no driver
  * materialization; the reference's caps are anti-features at scale).
  *
  * Reference semantics kept: string-typed cells on ingest
  * (main.py:126,271,376) unless `inferTypes`; fully-empty rows dropped
  * (main.py:139-147); TXT delimiter sniffing (main.py:226-238).
  */
object Sources {

  final case class SourceError(message: String) extends RuntimeException(message)

  /** S1 (main.py:78-115): dispatch on extension; unsupported → error. */
  def load(spark: SparkSession, path: String, inferTypes: Boolean = false): DataFrame = {
    val lower = path.toLowerCase
    if (lower.endsWith(".csv")) csv(spark, path, inferTypes)
    else if (lower.endsWith(".json")) json(spark, path)
    else if (lower.endsWith(".txt")) txt(spark, path)
    else if (lower.endsWith(".parquet")) spark.read.parquet(path)
    else if (lower.endsWith(".orc")) spark.read.orc(path)
    else throw SourceError(s"Unsupported file type: $path (use .csv, .json, .txt, .parquet, .orc)")
  }

  /** S2 (main.py:117-158): header-row schema, empty-file/no-data/invalid-
    * header rejection, fully-empty-row drop. FAILFAST surfaces malformed
    * rows at read time instead of silently nulling them. */
  def csv(spark: SparkSession, path: String, inferTypes: Boolean = false): DataFrame = {
    val df = spark.read
      .option("header", "true")
      .option("mode", "FAILFAST")
      .option("inferSchema", inferTypes.toString)
      .csv(path)
    if (df.columns.isEmpty) throw SourceError("CSV file is empty")
    if (df.columns.exists(c => c == null || c.trim.isEmpty || c.matches("_c\\d+")))
      throw SourceError(s"CSV file has invalid or missing column headers: ${df.columns.mkString(",")}")
    val cleaned = CoreOps.dropBlankRows(df)
    if (cleaned.isEmpty) throw SourceError("CSV file contains no data rows")
    cleaned
  }

  /** S3 (main.py:160-211): top-level array of objects, non-empty, strict
    * schema consistency. Spark infers the union of key sets; the strict
    * check compares each row's non-null footprint... at scale a full
    * per-row key-set audit is a data-quality query, exposed separately
    * via [[jsonKeyAudit]]; the read itself uses FAILFAST for malformed
    * JSON. */
  def json(spark: SparkSession, path: String): DataFrame = {
    // reference contract (main.py:170-171): top level MUST be an array —
    // a single object parses fine in Spark, so check the first byte
    val firstChar = spark.read.text(path)
      .filter(trim(col("value")) =!= "")
      .head(1).headOption.map(_.getString(0).trim.head)
    if (!firstChar.contains('['))
      throw SourceError("JSON file must contain an array of objects")
    val df = spark.read
      .option("multiLine", "true")
      .option("mode", "FAILFAST")
      .json(path)
    if (df.columns.contains("_corrupt_record"))
      throw SourceError("JSON file must contain an array of objects")
    if (df.isEmpty) throw SourceError("JSON file contains no data")
    df
  }

  /** The reference's per-row missing/extra-key diagnostics
    * (main.py:187-200) as a distributed audit: rows where any inferred
    * column is null (a proxy for "key missing in this object"). Returns
    * (row_id, missing_keys). */
  def jsonKeyAudit(df: DataFrame): DataFrame = {
    val missing = array_compact(array(df.columns.map(c =>
      when(col(c).isNull, lit(c))): _*))
    df.select(monotonically_increasing_id().as("row_id"), missing.as("missing_keys"))
      .filter(size(col("missing_keys")) > 0)
  }

  /** S4/S5 (main.py:213-285): TXT with delimiter sniffing. The sniff
    * reads ONE line on the driver (head, not collect); the actual parse
    * is a distributed csv/text read. */
  def txt(spark: SparkSession, path: String): DataFrame = {
    val firstLine = spark.read.text(path)
      .filter(trim(col("value")) =!= "")
      .head(1).headOption.map(_.getString(0))
      .getOrElse(throw SourceError("TXT file is empty"))
    sniffDelimiter(firstLine) match {
      case Some(delim) => structuredTxt(spark, path, delim)
      case None =>
        spark.read.text(path)
          .select(trim(col("value")).as("content"))
          .filter(col("content") =!= "")
    }
  }

  /** The reference's sniffing heuristic, exactly (main.py:226-238):
    * comma if the first line's first 3 comma-tokens are <30 chars and
    * space-free; else pipe if present; else tab if present; else
    * unstructured. */
  def sniffDelimiter(firstLine: String): Option[String] = {
    if (firstLine.contains(",")) {
      val parts = firstLine.split(",", -1).take(3)
      if (parts.forall(p => p.trim.length < 30 && !p.trim.contains(" ")))
        return Some(",")
    }
    if (firstLine.contains("|")) Some("|")
    else if (firstLine.contains("\t")) Some("\t")
    else None
  }

  /** Structured TXT (main.py:252-285): delimiter-split with header row;
    * identifier-only header names; strict arity via FAILFAST. */
  def structuredTxt(spark: SparkSession, path: String, delim: String): DataFrame = {
    val df = spark.read
      .option("header", "true")
      .option("sep", delim)
      .option("mode", "FAILFAST")
      .csv(path)
    val badHeaders = df.columns.filterNot(_.matches("[A-Za-z0-9_]+"))
    if (badHeaders.nonEmpty)
      throw SourceError(s"Invalid header names: ${badHeaders.mkString(",")}")
    CoreOps.trimAll(CoreOps.dropBlankRows(df))
  }

  /** Raw-file ingest for multimodal corpora (engine extension): each
    * matching file becomes one row of (path, length, modificationTime,
    * content binary) via Spark's `binaryFile` source — the on-ramp into
    * [[graft.ext.Multimodal]]'s binary payload pipeline. `pathGlob`
    * filters at the LISTING stage (pushed filter on the file index, not
    * a post-read filter), and `maxBytesPerFile` guards against a single
    * giant blob skewing a task. At 100 TB this source parallelizes by
    * file; pack small files into larger archives upstream or the
    * driver's file listing becomes the bottleneck. */
  def binaryFiles(
      spark: SparkSession, dir: String,
      pathGlob: Option[String] = None,
      maxBytesPerFile: Option[Long] = None): DataFrame = {
    val base = spark.read.format("binaryFile")
    val withGlob = pathGlob.fold(base)(g => base.option("pathGlobFilter", g))
    val df = withGlob.load(dir)
    maxBytesPerFile.fold(df)(m => df.filter(col("length") <= m))
  }
}
