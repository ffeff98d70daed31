package graft.sources

import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._
import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem whose WRITE-path permission ops never fork.
  *
  * Without the native hadoop library, Hadoop's RawLocalFileSystem shells
  * out (`chmod`, `ls`, `readlink`) for permission operations — one fork
  * per created file. In this container JDK17's jspawnhelper intermittently
  * deadlocks under concurrent spawns, hanging streaming state-store
  * commits mid-micro-batch. Doing the chmod with java.nio keeps the
  * file-CREATE path (the hot one — every task/state-store commit chmods)
  * in-process. Honest bound: permission READS still fork lazily
  * (RawLocalFileSystem's DeprecatedRawLocalFileStatus runs `ls -ld` the
  * first time getPermission() is called on a status) — nothing in
  * graft's paths reads permissions, but a consumer that does re-enters
  * the fork hazard. Registered via
  * `spark.hadoop.fs.file.impl=graft.sources.NioLocalFileSystem`.
  */
class NioRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val perms = new java.util.HashSet[PosixFilePermission]()
    val m: Int = permission.toShort & 0x1ff
    val bits = Seq(
      0x100 -> OWNER_READ, 0x80 -> OWNER_WRITE, 0x40 -> OWNER_EXECUTE,
      0x20 -> GROUP_READ, 0x10 -> GROUP_WRITE, 0x8 -> GROUP_EXECUTE,
      0x4 -> OTHERS_READ, 0x2 -> OTHERS_WRITE, 0x1 -> OTHERS_EXECUTE)
    bits.foreach { case (bit, perm) => if ((m & bit) != 0) perms.add(perm) }
    java.nio.file.Files.setPosixFilePermissions(pathToFile(p).toPath, perms)
  }
}

class NioLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem)
