package graft.io

import java.nio.file.{Files, Path, Paths}
import java.util.zip.CRC32

/** Cheap content-sensitive fingerprint of a parquet table's files.
  *
  * (path, size, mtime) alone can serve a stale memoized model when a
  * same-size rewrite lands within the filesystem's mtime granularity
  * (spec temp dirs, regenerated fixtures in a long-lived JVM). Adding a
  * CRC32 of each file's FINAL 4 KiB closes that hole for parquet
  * specifically: the footer lives at the tail and carries row-group
  * offsets, statistics, and created-by metadata, so any content change
  * perturbs those bytes even when the total size collides. Reading 4 KiB
  * per part-file is O(files), not O(data) — safe to call per query.
  */
object Fingerprint {

  /** Fingerprint of `sfDir/table.parquet` (file or directory of parts). */
  def of(sfDir: String, table: String): String =
    ofPath(Paths.get(sfDir, s"$table.parquet").toString)

  def ofPath(path: String): String = {
    val p = Paths.get(path)
    val parts: Seq[Path] =
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.filter(f => !Files.isDirectory(f)).toSeq
            .sortBy(_.toString)
        } finally s.close()
      } else Seq(p)
    parts.map { f =>
      s"$f:${Files.size(f)}:${Files.getLastModifiedTime(f)}:${tailCrc(f)}"
    }.mkString(s"$path|", ";", "")
  }

  private def tailCrc(f: Path): Long = {
    val raf = new java.io.RandomAccessFile(f.toFile, "r")
    try {
      val n = math.min(raf.length(), 4096L).toInt
      raf.seek(raf.length() - n)
      val buf = new Array[Byte](n)
      raf.readFully(buf)
      val crc = new CRC32
      crc.update(buf)
      crc.getValue
    } finally raf.close()
  }
}
