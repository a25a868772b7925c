package graft

import java.net.URI
import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

/** Test FileSystem modeling an EVENTUALLY-LISTING object store (the
  * classic S3 semantics): file CONTENT is read/written through the
  * local FS unchanged, but directory LISTINGS can be stale — either
  * serving a SNAPSHOT captured earlier (files since deleted still
  * listed, the compaction race) or HIDING named files that exist (a
  * fresh write not yet visible, the partial-part race). Staleness is
  * armed once and consumed by the next listing of the matching
  * directory, which models convergence: the retry sees fresh truth.
  *
  * Used by ArtifactRegistrySpec to pin the registry's durable-FS
  * contract deterministically — no sleeps, no real object store.
  */
class StaleListingFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("stale:///")

  override def listStatus(p: Path): Array[FileStatus] = {
    val snap = StaleListingFs.staleSnapshot.get()
    if (snap != null && p.toUri.getPath == snap._1) {
      StaleListingFs.staleSnapshot.set(null) // consumed: next listing is fresh
      return snap._2
    }
    // materialize plain FileStatus objects: the raw local statuses load
    // permissions lazily via java.io.File, which rejects the stale: URI
    val real = super.listStatus(p).map { st =>
      new FileStatus(st.getLen, st.isDirectory, st.getReplication,
        st.getBlockSize, st.getModificationTime, st.getAccessTime,
        if (st.isDirectory) org.apache.hadoop.fs.permission.FsPermission.getDirDefault
        else org.apache.hadoop.fs.permission.FsPermission.getFileDefault,
        "", "", st.getPath)
    }
    val hidden = StaleListingFs.hiddenOnce.get()
    if (hidden != null && p.toUri.getPath == hidden._1) {
      StaleListingFs.hiddenOnce.set(null)
      real.filterNot(st => hidden._2.contains(st.getPath.getName))
    } else real
  }
}

object StaleListingFs {
  /** (dir path, captured statuses): the next listStatus of that dir
    * returns the capture verbatim — files deleted since then are
    * still promised to the reader. */
  val staleSnapshot =
    new java.util.concurrent.atomic.AtomicReference[(String, Array[FileStatus])](null)

  /** (dir path, file names): the next listStatus of that dir omits
    * these names — a write the listing has not yet surfaced. */
  val hiddenOnce =
    new java.util.concurrent.atomic.AtomicReference[(String, Set[String])](null)

  def reset(): Unit = { staleSnapshot.set(null); hiddenOnce.set(null) }
}
