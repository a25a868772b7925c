package graft

import java.net.URI
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Test FileSystem that records every rename() with its (src, dst) —
  * the mechanical audit behind the registry's object-store contract
  * ([[graft.ext.ArtifactRegistry]] scaladoc): the registry's OWN
  * protocol (part land → manifest append → pin append → compaction →
  * gc) performs ZERO renames; the only renames on the wire are the
  * parquet committer's, each strictly INSIDE the single directory
  * being written (`<dir>/_temporary/... → <dir>/...`). That is exactly
  * the per-directory atomicity the contract delegates to the
  * deployment's committer — on a store without atomic rename, an
  * S3-optimized committer removes these and nothing else changes.
  *
  * This is the closest validation the build environment admits: no
  * egress, no S3 endpoint, no hadoop-aws jars (see STATUS.md). The
  * audit proves the delegation boundary is where the scaladoc says it
  * is, not that any particular committer behaves.
  */
class RenameAuditFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("audit:///")

  override def rename(src: Path, dst: Path): Boolean = {
    RenameAuditFs.renames.add((src.toUri.getPath, dst.toUri.getPath))
    super.rename(src, dst)
  }

  // materialize plain FileStatus objects: the raw local statuses load
  // permissions lazily via java.io.File, which rejects the audit: URI
  // (the StaleListingFs fix)
  override def listStatus(p: Path): Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(p).map { st =>
      new org.apache.hadoop.fs.FileStatus(st.getLen, st.isDirectory,
        st.getReplication, st.getBlockSize, st.getModificationTime,
        st.getAccessTime,
        if (st.isDirectory) org.apache.hadoop.fs.permission.FsPermission.getDirDefault
        else org.apache.hadoop.fs.permission.FsPermission.getFileDefault,
        "", "", st.getPath)
    }
}

object RenameAuditFs {
  val renames =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()

  def reset(): Unit = renames.clear()

  def snapshot(): Seq[(String, String)] = {
    val it = renames.iterator()
    val acc = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (it.hasNext) acc += it.next()
    acc.toSeq
  }
}
