package graft

import java.net.URI
import org.apache.hadoop.fs.{Path, RawLocalFileSystem, FSDataInputStream}

/** Test FileSystem that records every open() with its path — the
  * mechanical audit behind the conversation serve's O(touched)-IO
  * claim ([[graft.enrich.ConversationCheckpoint.chainResults]]): with
  * the chain's `results` parts group-bucketed, a micro-batch's fold
  * must OPEN only data files inside the touched groups' bucket
  * subdirectories, never the untouched buckets' — partition pruning
  * observed on the wire, not inferred from a plan string. The
  * [[RenameAuditFs]] discipline applied to reads.
  */
class OpenAuditFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("oaudit:///")

  override def open(p: Path, bufferSize: Int): FSDataInputStream = {
    OpenAuditFs.opens.add(p.toUri.getPath)
    super.open(p, bufferSize)
  }

  // materialize plain FileStatus objects: the raw local statuses load
  // permissions lazily via java.io.File, which rejects the oaudit: URI
  // (the RenameAuditFs/StaleListingFs fix)
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

object OpenAuditFs {
  val opens = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  def reset(): Unit = opens.clear()

  def snapshot(): Seq[String] = {
    val it = opens.iterator()
    val acc = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) acc += it.next()
    acc.toSeq
  }
}
