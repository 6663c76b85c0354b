package graft.tools

import org.apache.hadoop.fs.{FileUtil, Path, RawLocalFileSystem}

/** Test filesystem simulating an OBJECT STORE's rename: a recursive
  * copy-then-delete instead of a metadata move (the s3a/gs/wasb behavior
  * class `Sink.compact`'s manifest commit exists for). Local files under a
  * `nacopy://` scheme; registered per-test via
  * `fs.nacopy.impl` = this class. Every rename through this FS is
  * data-sized and non-atomic — a spec that passes here cannot be relying
  * on rename atomicity anywhere in its commit path. */
class CopyRenameFileSystem extends RawLocalFileSystem {

  override def getScheme: String = "nacopy"

  override def getUri: java.net.URI = java.net.URI.create("nacopy:///")

  override def rename(src: Path, dst: Path): Boolean = {
    if (!exists(src) || exists(dst)) return false
    // Copy first (files appear at dst progressively — the non-atomic
    // window), then delete the source: the object-store client recipe.
    FileUtil.copy(this, src, this, dst, false, getConf) &&
      delete(src, true)
  }
}
