package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch sources over the driver's synthetic parquet tables (TESTDATA.md).
  *
  * Scale notes (100 TB design): every loader returns a plain scan DataFrame —
  * no caching, no collect — so Catalyst can push filters/projections into the
  * parquet reader (`PushedFilters`/`ReadSchema`). Partitioning is whatever the
  * files provide; downstream operators decide shuffle keys. Dimension tables
  * (region/nation/supplier/part/customer) stay broadcast-joinable at any SF.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Generic loader: `Tables.load(spark, sfDir, "lineitem")`. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** `events` ships as parquet TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). We read nanos as Long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microseconds —
    * integer division, never double math: epoch-nanos ≈ 1.7e18 exceeds a
    * double's 53-bit mantissa.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, sfDir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Register every table as a temp view for the SQL surface. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
}
