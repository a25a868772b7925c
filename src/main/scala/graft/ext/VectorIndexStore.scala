package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet persistence for the vector-index artifacts — the missing
  * half of the session caches ([[graft.queries.SketchQueries]]): a real
  * serving pipeline trains codebooks ONCE per corpus version, ships
  * them to storage, and every later batch loads the frozen index
  * instead of retraining (the q120/q155/q159 ingest-vs-probe split,
  * applied to vectors). Everything stored is exact integers (SQ8
  * codewords, Lloyd centroids, PQ assignments), so a parquet round
  * trip is bit-lossless and a loaded index is value-identical to the
  * built one — spec-pinned in VectorIndexStoreSpec and gated by q165's
  * oracle (which recomputes the whole search from scratch in SQL).
  *
  * Layout of an IVF-PQ index at `path/`:
  *   - `coarse/`  (cluster, d, m)        — K×64 rows, KB-sized
  *   - `asg/`     (id, coarse)           — one row per corpus vector
  *   - `books/`   (sub, cluster, d, m)   — M×K×16 rows, KB-sized
  *   - `enc/`     (id, sub, cluster)     — M rows per corpus vector
  *
  * Scale shape: `coarse`/`books` are broadcast-sized and read whole;
  * `asg`/`enc` are corpus-sized and written with their natural
  * upstream partitioning (parallel parquet, no coalesce-to-1 — at
  * 100 TB these are the same width as the corpus and must stay
  * many-file). Search-side consumers join them by id/cluster exactly
  * as the in-memory index, so persistence changes WHERE the frames
  * come from, never the plan downstream.
  */
object VectorIndexStore {

  private val Parts = Seq("coarse", "asg", "books", "enc")

  /** Write an IVF-PQ index (the [[ProductQuantize.ivfPqIndexFrom]]
    * tuple) under `path` — mode overwrite: re-ingesting a corpus
    * version replaces the index atomically per part. */
  def writeIvfPq(index: (DataFrame, DataFrame, DataFrame, DataFrame),
      path: String): Unit = {
    val (coarse, asg, books, enc) = index
    Parts.zip(Seq(coarse, asg, books, enc)).foreach { case (part, df) =>
      df.write.mode("overwrite").parquet(s"$path/$part")
    }
  }

  /** Load a persisted IVF-PQ index — lazy scans, so a probe executed
    * against the result reads the parquet files and touches no
    * training code path. */
  def readIvfPq(s: SparkSession, path: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val Seq(coarse, asg, books, enc) = Parts.map(p => s.read.parquet(s"$path/$p"))
    (coarse, asg, books, enc)
  }

  /** Write a standalone PQ codebook table (sub, cluster, d, m) — the
    * frozen-codebook artifact new-vector ingest encodes against. */
  def writeBooks(books: DataFrame, path: String): Unit =
    books.write.mode("overwrite").parquet(path)

  def readBooks(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  /** One random token per JVM: two PROCESSES writing the same corpus's
    * artifacts must not clobber each other mid-read (observed: a
    * concurrently running Verify overwrote `nb_model/` while a test
    * JVM's lazy scan was reading it → FAILED_READ_FILE). Within one
    * JVM the (session, dir) caches already guarantee a single write;
    * across JVMs the artifacts were never shared anyway — every
    * process rebuilds on first access — so isolating the root loses
    * nothing. A production deployment replaces this with versioned
    * paths on durable storage (write once, readers pin a version). */
  private val jvmToken: String = java.util.UUID.randomUUID.toString.take(8)

  // every per-JVM tree is garbage the moment its process exits (no
  // other process ever reads it) — delete it on shutdown, or a CI host
  // running many JVMs fills java.io.tmpdir with orphaned artifact trees
  locally {
    val root = java.nio.file.Paths.get(
      s"${System.getProperty("java.io.tmpdir")}/graft-index")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      // collect each listing BEFORE deleting (deleting under a live
      // directory stream leaks the descriptor and may skip entries on
      // some filesystems); walk deepest-first so children go before
      // their parent, every stream closed before any delete runs
      def rmTree(top: Path): Unit = {
        val walk = Files.walk(top)
        val all = try {
          walk.sorted(java.util.Comparator.reverseOrder[Path]())
            .collect(java.util.stream.Collectors.toList[Path])
        } finally walk.close()
        all.forEach(p => Files.deleteIfExists(p))
      }
      try {
        if (Files.isDirectory(root)) {
          val ls = Files.list(root)
          val mine = try {
            ls.filter(_.getFileName.toString.startsWith(s"$jvmToken-"))
              .collect(java.util.stream.Collectors.toList[Path])
          } finally ls.close()
          mine.forEach(rmTree(_))
        }
      } catch { case _: Throwable => () } // best-effort cleanup only
    }, "graft-index-cleanup"))
  }

  /** Deterministic-per-corpus, isolated-per-process index location
    * under the JVM temp dir — keyed by the data dir's md5 so sessions
    * over different corpora never collide, and by [[jvmToken]] so
    * concurrent processes never overwrite each other's live scans. */
  def defaultPath(dir: String, kind: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"${System.getProperty("java.io.tmpdir")}/graft-index/$jvmToken-$h/$kind"
  }
}
