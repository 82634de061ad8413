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

  private val lastSeen =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** [[of]] + staleness defense for the JVM-level content memos: when the
    * fingerprint of a path this JVM has ALREADY fingerprinted changes (a
    * parquet rewritten in place — regenerated fixture, relanded daily
    * table), Spark's plan-equality CacheManager would otherwise keep
    * serving operator-internal caches built over the OLD bytes (the
    * cached logical plan embeds only the path string), so the memo's
    * retrain would silently re-collect stale data. `refreshByPath`
    * invalidates every cached plan touching the path; it fires ONLY on a
    * changed re-sighting — never in steady state — so the hot path pays
    * one map upsert.
    */
  def ofRefreshing(sfDir: String, table: String): String = {
    val path = Paths.get(sfDir, s"$table.parquet").toString
    val fp = ofPath(path)
    val prev = lastSeen.put(path, fp)
    if (prev != null && prev != fp)
      org.apache.spark.sql.SparkSession.active.catalog.refreshByPath(path)
    fp
  }

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
