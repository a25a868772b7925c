package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping fixed-width document chunking — the RAG/embedding ingest
  * shape (stride < width keeps sentences straddling a boundary
  * retrievable from both sides). ONE definition shared by q99, the
  * q100 retrieval-prep composition, and their specs, so the chunk
  * geometry cannot drift between consumers or between engine and
  * oracle (the SQL mirrors interpolate [[Width]]/[[Stride]]).
  *
  * Fully declarative (`sequence` → `explode` → `substr`): codegen'd,
  * shuffle-free, and stream-safe (stateless projection).
  */
object Chunking {

  /** Default chunk geometry, shared with the oracle SQL strings. */
  val Width = 200
  val Stride = 150

  /** Append (off, chunk_no, chunk) — one output row per chunk, all
    * input columns preserved. Rows with empty `textCol` produce no
    * chunks (callers filter `length > 0` to make that explicit). */
  def overlapping(df: DataFrame, textCol: String,
      width: Int = Width, stride: Int = Stride): DataFrame = {
    require(width >= 1 && stride >= 1 && stride <= width,
      s"need 1 <= stride <= width, got width=$width stride=$stride")
    df.withColumn("off",
        explode(sequence(lit(0), length(col(textCol)) - 1, lit(stride))))
      .withColumn("chunk_no", (col("off") / stride).cast("long"))
      .withColumn("off", col("off").cast("long"))
      .withColumn("chunk", expr(s"substr($textCol, off + 1, $width)"))
  }
}
