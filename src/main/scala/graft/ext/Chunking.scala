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
    // the three output names are fixed; withColumn would silently
    // CLOBBER same-named input columns, so reject the collision up front
    val clash = df.columns.filter(Set("off", "chunk_no", "chunk"))
    require(clash.isEmpty,
      s"overlapping() appends off/chunk_no/chunk; input already has ${clash.mkString(", ")}")
    df.withColumn("off",
        explode(sequence(lit(0), length(col(textCol)) - 1, lit(stride))))
      .withColumn("chunk_no", (col("off") / stride).cast("long"))
      .withColumn("off", col("off").cast("long"))
      // col(), not string interpolation into expr() — survives column
      // names that aren't bare SQL identifiers
      .withColumn("chunk",
        col(textCol).substr((col("off") + 1).cast("int"), lit(width)))
  }
}
