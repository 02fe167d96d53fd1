package graft.ops

import org.apache.hadoop.fs.{FileSystem, LocalFileSystem, Path, RawLocalFileSystem}

/** ATOMIC PUT-IF-ABSENT WITH CONTENT — the LogStore primitive every
  * log-structured commit protocol stands on (Delta documents exactly this
  * contract): claiming a commit slot must make the slot's CONTENT visible
  * in the same atomic step, or a concurrent reader can observe a
  * claimed-but-empty record — a torn commit. `FileSystem.create(overwrite
  * = false)` + `write` is NOT that: the file exists (the claim is taken)
  * before the body lands, and the race is real — thread-parallel OCC
  * writers hit it (a finalizer read an empty marker and died on
  * `new Path("")`).
  *
  * Local filesystems get a genuinely atomic implementation: write the
  * body to a uniquely-named temp file, then `Files.createLink(slot, tmp)`
  * — hard-link creation is atomic and FAILS if the slot exists, which is
  * simultaneously the compare-and-swap and the content publication.
  * (A rename would not do: POSIX rename silently OVERWRITES an existing
  * destination, destroying the CAS.) Object stores supply the same
  * contract natively via conditional put (S3 If-None-Match, GCS
  * if-generation-match, ABFS ETag) — the create() fallback below marks
  * where a production LogStore binds that; HDFS create(overwrite=false)
  * is itself atomic-with-lease, so the fallback is correct there too.
  */
object AtomicPut {

  /** Publish `bytes` at `p` iff `p` does not exist. True = this caller
    * won the slot; false = someone else holds it (with their content
    * fully visible).
    */
  def apply(fs: FileSystem, p: Path, bytes: Array[Byte]): Boolean = fs match {
    case _: LocalFileSystem | _: RawLocalFileSystem =>
      val dst = java.nio.file.Paths.get(p.toUri.getPath)
      java.nio.file.Files.createDirectories(dst.getParent)
      val tmp = dst.getParent.resolve(
        s".claim-${java.util.UUID.randomUUID().toString.take(12)}.tmp")
      java.nio.file.Files.write(tmp, bytes)
      try { java.nio.file.Files.createLink(dst, tmp); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      } finally { java.nio.file.Files.deleteIfExists(tmp); () }
    case _ =>
      // HDFS: create(overwrite=false) is atomic under the namenode lease.
      // Object stores: bind the store's conditional put here.
      try {
        val out = fs.create(p, false)
        try out.write(bytes) finally out.close()
        true
      } catch { case _: java.io.IOException if fs.exists(p) => false }
  }
}
