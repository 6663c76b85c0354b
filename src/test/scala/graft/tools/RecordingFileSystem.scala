package graft.tools

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.apache.hadoop.util.Progressable

/** Test filesystem that journals mutations (create/delete/rename) in call
  * order, for specs that assert WAL/commit-marker ordering — e.g. that a
  * model re-save retracts its commit marker BEFORE touching the payload
  * files. Local files under a `reclog://` scheme; registered per-test via
  * `fs.reclog.impl` = this class. Single-JVM log (local-mode executors
  * share it). */
class RecordingFileSystem extends RawLocalFileSystem {

  override def getScheme: String = "reclog"

  override def getUri: java.net.URI = java.net.URI.create("reclog:///")

  override def create(f: Path, permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    RecordingFileSystem.log("create", f)
    super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    RecordingFileSystem.log("delete", f)
    super.delete(f, recursive)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    RecordingFileSystem.log("rename", dst)
    super.rename(src, dst)
  }
}

object RecordingFileSystem {
  private val ops =
    new java.util.concurrent.CopyOnWriteArrayList[(String, String)]

  private def log(op: String, p: Path): Unit =
    ops.add((op, p.toUri.getPath))

  def reset(): Unit = ops.clear()

  /** (op, absolute path) pairs in call order. */
  def journal: Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    ops.asScala.toSeq
  }
}
