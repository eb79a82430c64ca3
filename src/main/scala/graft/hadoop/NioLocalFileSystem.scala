package graft.hadoop

import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem with a pure-JVM `chmod` (optimization round 15).
  *
  * Hadoop's `RawLocalFileSystem` applies permissions through
  * `NativeIO.POSIX.chmod` when `libhadoop.so` is loadable and otherwise
  * FORKS A `chmod` PROCESS per call (`Shell.execCommand` — the only
  * `execCommand` site in the class). Spark-only installs ship no native
  * Hadoop library, and `LocalFSFileOutputStream` calls `setPermission`
  * for EVERY created file, so on this deployment every parquet part,
  * every `.crc` sidecar and every task-attempt directory paid a process
  * fork from a multi-GB JVM — measured at ~100-150 ms of task time per
  * created file, which made small-file store maintenance (256-bucket
  * layouts, 16-shard manifests) the suite's dominant fixed cost: a
  * 33k-row 256-directory write carried ~35-60 s of cumulative task time
  * for ~0.1 s of real I/O.
  *
  * The override replaces the fork with `Files.setPosixFilePermissions`
  * — the same syscall `NativeIO.chmod` would issue — restoring the
  * behavior Hadoop itself intends on a native-enabled deployment. This
  * is an environment repair, not a semantics change: permissions set,
  * bytes written and failure modes are identical, and non-local
  * deployments (HDFS/S3, where `file://` only backs scratch space)
  * never see this class. `setPermission` is virtual and the inner
  * output-stream class dispatches through it, so the single override
  * covers file create, mkdirs and explicit chmod paths alike.
  */
class NioRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit =
    if (permission == null) super.setPermission(p, permission)
    else {
      val m: Int = permission.toShort.toInt
      val set = java.util.EnumSet.noneOf(classOf[PosixFilePermission])
      NioRawLocalFileSystem.Bits.foreach { case (bit, perm) =>
        if ((m & bit) != 0) set.add(perm)
      }
      try java.nio.file.Files.setPosixFilePermissions(pathToFile(p).toPath, set)
      catch {
        // non-POSIX store or exotic mount: fall back to Hadoop's own
        // (fork-based) path rather than fail the write
        case _: UnsupportedOperationException => super.setPermission(p, permission)
      }
    }
}

object NioRawLocalFileSystem {
  private val Bits: Seq[(Int, PosixFilePermission)] = Seq(
    0x100 -> OWNER_READ, 0x80 -> OWNER_WRITE, 0x40 -> OWNER_EXECUTE,
    0x20 -> GROUP_READ, 0x10 -> GROUP_WRITE, 0x8 -> GROUP_EXECUTE,
    0x4 -> OTHERS_READ, 0x2 -> OTHERS_WRITE, 0x1 -> OTHERS_EXECUTE)
}

/** The checksummed `file://` filesystem over [[NioRawLocalFileSystem]]
  * — drop-in for `org.apache.hadoop.fs.LocalFileSystem` via
  * `spark.hadoop.fs.file.impl`. No-arg constructor for Hadoop's
  * reflective instantiation.
  */
class NioLocalFileSystem() extends LocalFileSystem(new NioRawLocalFileSystem)

object NioLocalFileSystem {
  /** Session-builder config installing the fork-free local FS: apply
    * BEFORE the first `file://` access — Hadoop's FileSystem cache keys
    * on (scheme, authority, ugi), so a LocalFileSystem created earlier
    * in the JVM would keep winning regardless of the conf.
    */
  val ConfKey = "fs.file.impl"
  val SparkConfKey = s"spark.hadoop.$ConfKey"
  def className: String = classOf[NioLocalFileSystem].getName

  /** The FileContext twin: Structured Streaming's checkpoint layer
    * (offset/commit logs, state-store delta and snapshot files) writes
    * through `FileContext`, whose `file://` binding is a SEPARATE class
    * hierarchy (`fs.AbstractFileSystem.file.impl` →
    * `o.a.h.fs.local.LocalFs` → ChecksumFs → RawLocalFs → delegate
    * `RawLocalFileSystem`) — so every micro-batch's state/commit file
    * still paid the chmod fork after the FileSystem-side fix. These
    * mirrors swap the delegate for [[NioRawLocalFileSystem]], keeping
    * the checksum layer and semantics identical.
    */
  val AbstractConfKey = "fs.AbstractFileSystem.file.impl"
  val SparkAbstractConfKey = s"spark.hadoop.$AbstractConfKey"
  def abstractClassName: String = classOf[NioLocalFs].getName
}

/** `o.a.h.fs.local.RawLocalFs` over [[NioRawLocalFileSystem]]. */
class NioRawLocalFs(uri: java.net.URI, conf: org.apache.hadoop.conf.Configuration)
    extends org.apache.hadoop.fs.DelegateToFileSystem(
      uri, new NioRawLocalFileSystem, conf, "file", false) {
  override def getUriDefaultPort: Int = -1
}

/** `o.a.h.fs.local.LocalFs` (the checksummed `file://`
  * AbstractFileSystem) over [[NioRawLocalFs]] — the (URI, Configuration)
  * constructor Hadoop's AbstractFileSystem reflection requires.
  */
class NioLocalFs(uri: java.net.URI, conf: org.apache.hadoop.conf.Configuration)
    extends org.apache.hadoop.fs.ChecksumFs(new NioRawLocalFs(uri, conf))
