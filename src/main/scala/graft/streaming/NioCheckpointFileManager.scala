package graft.streaming

import java.io.{FileNotFoundException, InputStream, OutputStream}
import java.nio.ByteBuffer
import java.nio.channels.SeekableByteChannel
import java.nio.file.{Files, NoSuchFileException, Paths, StandardCopyOption, StandardOpenOption, Path => JPath}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FSDataInputStream, Path, PathFilter, PositionedReadable, Seekable}
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager.CancellableFSDataOutputStream

/** Pure-`java.nio` [[CheckpointFileManager]] for `file:` checkpoint
  * locations, plugged in via
  * `spark.sql.streaming.checkpointFileManagerClass` (the documented
  * extension point this interface exists for).
  *
  * Why: Spark's default managers route every checkpoint file through
  * the Hadoop local filesystem, and without `libhadoop` native code
  * each permission operation there is a FORKED `chmod` PROCESS
  * (`o.a.h.util.Shell`). A stateful streaming microbatch commits one
  * delta file per state store per partition — a measured replay of one
  * stream-stream join row forked ~1,600 processes, the dominant cost
  * of every local streaming run (state rows are tiny; the files are
  * not the cost, the forks are). This manager performs the same
  * rename-based atomic-commit protocol with `java.nio.file` calls only
  * (zero subprocesses, zero Hadoop FS objects), preserving the
  * contract the state store and the offset/commit WALs rely on:
  *
  *   - `createAtomic` writes a hidden sibling temp file and
  *     ATOMIC_MOVEs it over the target on close (POSIX `rename(2)` —
  *     readers see the old file or the new one, never a torn write);
  *     `overwriteIfPossible = false` surfaces Hadoop's
  *     `FileAlreadyExistsException`, which `HDFSMetadataLog` catches
  *     to detect a concurrently-committing writer.
  *   - `open` serves a seekable, positioned-readable stream (the state
  *     store seeks within snapshot/delta files on recovery).
  *
  * Scope: LOCAL deployments — single-node jobs, tests, and benchmarks
  * (this repo's `local[32]` contract). A cluster checkpointing to an
  * object store or HDFS must keep the default Hadoop-FS managers; the
  * constructor rejects non-`file:` schemes so a misconfiguration fails
  * loudly at query start rather than corrupting checkpoints silently.
  */
class NioCheckpointFileManager(root: Path, conf: Configuration)
    extends CheckpointFileManager {

  require(root.toUri.getScheme == null || root.toUri.getScheme == "file",
    s"NioCheckpointFileManager handles only file: checkpoint paths, got $root")

  private def nio(p: Path): JPath = Paths.get(p.toUri.getPath)

  /** The rename-on-close protocol (`RenameHelperMethods` is sealed, so
    * this re-implements `RenameBasedFSDataOutputStream`'s small close/
    * cancel state machine over NIO): bytes land in a hidden sibling
    * temp file; `close` ATOMIC_MOVEs it over the target (readers see
    * old-or-new, never torn); `cancel` deletes the temp. Both are
    * idempotent and mutually exclusive, as the WAL commit paths expect
    * (a task that fails after `cancel` may still call `close` from a
    * finally block). */
  private final class NioAtomicStream(target: JPath, tmp: JPath,
      overwriteIfPossible: Boolean)
      extends CancellableFSDataOutputStream(
        new java.io.BufferedOutputStream( // WAL writers emit many small
          Files.newOutputStream(tmp, StandardOpenOption.CREATE, // writes;
            StandardOpenOption.TRUNCATE_EXISTING, // don't pay a syscall
            StandardOpenOption.WRITE))) { // per write() call

    private var terminated = false

    override def close(): Unit = synchronized {
      if (!terminated) {
        terminated = true
        underlyingStream.close()
        if (overwriteIfPossible) {
          Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
        } else {
          // ATOMICALLY fail if the target exists — rename(2) silently
          // REPLACES, so a check-then-move would let two racing writers
          // both believe they won the batch commit (HDFSMetadataLog
          // detects the loser via Hadoop's FileAlreadyExistsException).
          // link(2) is the POSIX primitive with exactly-one-winner
          // semantics: publish via hard link, then drop the temp name.
          try {
            Files.createLink(target, tmp)
            Files.deleteIfExists(tmp)
          } catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              Files.deleteIfExists(tmp)
              throw new org.apache.hadoop.fs.FileAlreadyExistsException(
                s"rename destination $target already exists")
            case _: UnsupportedOperationException =>
              // no-hardlink filesystem: fall back to check-then-move and
              // accept the narrow race this cannot close
              if (Files.exists(target)) {
                Files.deleteIfExists(tmp)
                throw new org.apache.hadoop.fs.FileAlreadyExistsException(
                  s"rename destination $target already exists")
              }
              Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
          }
        }
        ()
      }
    }

    override def cancel(): Unit = synchronized {
      if (!terminated) {
        terminated = true
        underlyingStream.close()
        Files.deleteIfExists(tmp)
        ()
      }
    }
  }

  override def createAtomic(path: Path,
      overwriteIfPossible: Boolean): CancellableFSDataOutputStream = {
    val target = nio(path)
    Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(
      "." + target.getFileName + "." + java.util.UUID.randomUUID + ".tmp")
    new NioAtomicStream(target, tmp, overwriteIfPossible)
  }

  override def open(path: Path): FSDataInputStream = {
    val p = nio(path)
    // no exists() pre-check — it cannot close the window anyway; map
    // the NIO miss to the FileNotFoundException callers catch for
    // missing batches (HDFSMetadataLog.get)
    val ch =
      try Files.newByteChannel(p, StandardOpenOption.READ)
      catch { case _: NoSuchFileException =>
        throw new FileNotFoundException(p.toString)
      }
    new FSDataInputStream(new NioSeekableInputStream(ch))
  }

  override def list(path: Path, filter: PathFilter): Array[FileStatus] = {
    val p = nio(path)
    if (!Files.isDirectory(p)) {
      if (!Files.exists(p)) throw new FileNotFoundException(p.toString)
      val st = status(path, p)
      return st match {
        case Some(s) if filter.accept(s.getPath) => Array(s)
        case _                                   => Array.empty
      }
    }
    val ls =
      try Files.list(p)
      catch { case _: NoSuchFileException =>
        throw new FileNotFoundException(p.toString)
      }
    try ls.iterator().asScala.flatMap { c =>
      val hp = new Path(path, c.getFileName.toString)
      // entries may vanish between enumeration and stat (a maintenance
      // thread purging old deltas): omit them, as Hadoop listStatus does
      if (filter.accept(hp)) status(hp, c) else None
    }.toArray
    finally ls.close()
  }

  private def status(hp: Path, p: JPath): Option[FileStatus] =
    try {
      val isDir = Files.isDirectory(p)
      val len = if (isDir) 0L else Files.size(p)
      Some(new FileStatus(len, isDir, 1, 64L * 1024 * 1024,
        Files.getLastModifiedTime(p).toMillis, hp))
    } catch { case _: NoSuchFileException => None }

  override def mkdirs(path: Path): Unit =
    Files.createDirectories(nio(path))

  override def exists(path: Path): Boolean = Files.exists(nio(path))

  override def delete(path: Path): Unit = {
    val p = nio(path)
    try {
      if (Files.isDirectory(p)) {
        val walk = Files.walk(p)
        try walk.iterator().asScala.toSeq
          .sortBy(-_.getNameCount).foreach(Files.deleteIfExists(_))
        finally walk.close()
      } else Files.deleteIfExists(p)
      ()
    } catch {
      // idempotent like fc.delete — including entries vanishing DURING
      // the walk (a maintenance thread purging old deltas in parallel):
      // walk's iterator surfaces that as UncheckedIOException
      case _: NoSuchFileException => ()
      case e: java.io.UncheckedIOException
          if e.getCause.isInstanceOf[NoSuchFileException] => ()
    }
  }

  override def isLocal: Boolean = true

  override def createCheckpointDirectory(): Path = {
    mkdirs(root)
    root
  }
}

/** Seekable + positioned-readable adapter from a NIO channel to the
  * stream shape `FSDataInputStream` requires. Positioned reads restore
  * the channel position (the `PositionedReadable` contract: thread-safe
  * reads that do not move the main cursor). */
private[streaming] final class NioSeekableInputStream(ch: SeekableByteChannel)
    extends InputStream with Seekable with PositionedReadable {

  // ALL channel access synchronizes on `this`: positioned reads move
  // the shared cursor temporarily, so an unsynchronized cursor read
  // racing one would read from the positioned offset (and have its own
  // advance clobbered by the restore). One lock covers both families —
  // the PositionedReadable thread-safety contract.

  private val one = ByteBuffer.allocate(1)

  override def read(): Int = synchronized {
    one.clear()
    val n = ch.read(one)
    if (n <= 0) -1 else one.get(0) & 0xff
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = synchronized {
    ch.read(ByteBuffer.wrap(b, off, len))
  }

  override def seek(pos: Long): Unit = synchronized { ch.position(pos); () }
  override def getPos: Long = synchronized { ch.position() }
  override def seekToNewSource(targetPos: Long): Boolean = false

  override def read(position: Long, buffer: Array[Byte], offset: Int,
                    length: Int): Int = synchronized {
    val saved = ch.position()
    try { ch.position(position); ch.read(ByteBuffer.wrap(buffer, offset, length)) }
    finally { ch.position(saved); () }
  }

  override def readFully(position: Long, buffer: Array[Byte], offset: Int,
                         length: Int): Unit = {
    var done = 0
    while (done < length) {
      val n = read(position + done, buffer, offset + done, length - done)
      if (n < 0) throw new java.io.EOFException(
        s"EOF at ${position + done} reading $length bytes from $position")
      done += n
    }
  }

  override def readFully(position: Long, buffer: Array[Byte]): Unit =
    readFully(position, buffer, 0, buffer.length)

  override def close(): Unit = synchronized { ch.close() }
}
