package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.Multimodal

/** Multimodal-pipeline queries. `multimodal_meta` (binary payload + typed
  * metadata extraction) is oracle-checked; the decode/feature path runs
  * through the typed `mapPartitions` stages (driver rows-only check +
  * scalatest, since the stub decoder is not SQL-expressible).
  */
object MultimodalJobs {

  /** Binary ingestion + metadata projection: payload byte length, content
    * hash, and the typed metadata columns.
    */
  def multimodalMeta(spark: SparkSession, sfDir: String): DataFrame =
    Multimodal.assetsFromDocuments(spark, Tables.documents(spark, sfDir))
      .toDF()
      .select(
        col("asset_id"),
        octet_length(col("content")).cast("long").as("n_bytes"),
        md5(col("content")).as("content_md5"),
        col("kind"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_frames").cast("long").as("n_frames"))

  val multimodalMetaSql: String =
    """SELECT doc_id AS asset_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  md5(text) AS content_md5,
      |  ['image','audio','video'][(doc_id % 3 + 1)::INT] AS kind,
      |  64 + (doc_id % 8) * 32 AS width,
      |  64 + ((doc_id // 8) % 8) * 32 AS height,
      |  1 + doc_id % 30 AS n_frames
      |FROM documents""".stripMargin

  /** Decode → stripe features over the binary payloads (stubbed codec,
    * real plumbing).
    */
  def multimodalFeatures(spark: SparkSession, sfDir: String): DataFrame =
    Multimodal.extractFeatures(
      Multimodal.assetsFromDocuments(spark, Tables.documents(spark, sfDir)),
      stripes = 4, frameTarget = 8).toDF()

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta" -> multimodalMeta,
    "multimodal_features" -> multimodalFeatures)

  val oracles: Map[String, String] = Map(
    "multimodal_meta" -> multimodalMetaSql)
}
