package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model._

/** Reference-shaped sources (SURVEY.md §2.1 S1–S4, §2.3 P1–P3).
  *
  * The reference hand-parses text lines in `map()` (`HotItem.java:44-47`,
  * `HotPages.java:44-49`). Spark-first restatement: schema'd CSV readers and
  * column expressions (`split`/`to_timestamp`) that stay inside whole-stage
  * codegen — no row-at-a-time lambdas, so at 100 TB the parse is vectorized
  * and the scan prunes columns.
  */
object Sources {

  val userBehaviorSchema: StructType = StructType(Seq(
    StructField("userId", LongType),
    StructField("itemId", LongType),
    StructField("categoryId", IntegerType),
    StructField("behavior", StringType),
    StructField("timestamp", LongType))) // epoch seconds

  val orderEventSchema: StructType = StructType(Seq(
    StructField("orderId", LongType),
    StructField("eventType", StringType),
    StructField("txId", StringType),
    StructField("timestamp", LongType)))

  val receiptEventSchema: StructType = StructType(Seq(
    StructField("txId", StringType),
    StructField("payChannel", StringType),
    StructField("timestamp", LongType)))

  private def secsToTs(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_seconds(col("timestamp"))).drop("timestamp")

  /** S1/P1: UserBehavior.csv — `543462,1715,1464116,pv,1511658000`. */
  def userBehaviorCsv(spark: SparkSession, path: String): Dataset[UserBehavior] = {
    import spark.implicits._
    secsToTs(spark.read.schema(userBehaviorSchema).csv(path)).as[UserBehavior]
  }

  /** S1/P2: OrderLog.csv — `34729,create,,1558430842` (txId empty on create). */
  def orderEventCsv(spark: SparkSession, path: String): Dataset[OrderEvent] = {
    import spark.implicits._
    secsToTs(spark.read.schema(orderEventSchema).csv(path))
      .na.fill("", Seq("txId")).as[OrderEvent]
  }

  /** S1/P2: ReceiptLog.csv — `ewr342as4,wechat,1558430845`. */
  def receiptEventCsv(spark: SparkSession, path: String): Dataset[ReceiptEvent] = {
    import spark.implicits._
    secsToTs(spark.read.schema(receiptEventSchema).csv(path)).as[ReceiptEvent]
  }

  /** S2/P3: Apache access log — `ip - - dd/MM/yyyy:HH:mm:ss +0000 METHOD url`
    * (reference parser `HotPages.java:44-49`; fields 0,1,3,5,6).
    */
  def apacheLog(spark: SparkSession, path: String): Dataset[ApacheLogEvent] = {
    import spark.implicits._
    parseApacheLines(spark.read.text(path)).as[ApacheLogEvent]
  }

  /** The parse itself, reusable over any one-column `value: String` frame. */
  def parseApacheLines(lines: DataFrame): DataFrame = {
    val f = split(col("value"), "\\s+")
    lines.select(
      f.getItem(0).as("ip"),
      f.getItem(1).as("userId"),
      to_timestamp(f.getItem(3), "dd/MM/yyyy:HH:mm:ss").as("ts"),
      f.getItem(5).as("method"),
      f.getItem(6).as("url"))
  }

  /** JSON-lines document source — the interchange format crawl pipelines
    * emit. Explicit schema, never inference (an inference pass scans the
    * corpus twice and races schema drift at 100 TB); PERMISSIVE mode
    * nulls malformed lines instead of failing the ingest, so one bad
    * record can't kill a corpus load. Works identically as
    * `spark.readStream` for the streaming ingest path.
    */
  def documentsJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .option("mode", "PERMISSIVE")
      .json(path)

  // ---- streaming sources (S1 replay, S3, S4) ----

  /** S1 streaming replay: a directory of CSV files as an unbounded source. */
  def userBehaviorStream(spark: SparkSession, dir: String): DataFrame =
    secsToTs(spark.readStream.schema(userBehaviorSchema).csv(dir))

  /** S3: socket source (`HotPages.java:41`). */
  def socketLines(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream.format("socket")
      .option("host", host).option("port", port).load()

  /** S4: Kafka source (`HotItem.java:34-40`); CSV-in-value like the
    * reference's `SimpleStringSchema`. The broker connection itself can't be
    * exercised here (no broker in the container), but the value-parse path
    * below is the same one unit-tested over in-memory `value: String`
    * frames — a typo there can't ship.
    */
  def kafkaLines(spark: SparkSession, servers: String, topic: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .load()
      .select(col("value").cast("string").as("value"))

  /** P1 over a `value: String` frame (what Kafka delivers): CSV-in-value →
    * typed UserBehavior columns. Works identically on batch frames,
    * `MemoryStream`, and `kafkaLines` output — the parse is `from_csv`
    * column expressions, source-agnostic by construction.
    */
  def parseUserBehaviorLines(lines: DataFrame): DataFrame =
    secsToTs(lines
      .select(from_csv(col("value"), userBehaviorSchema,
        Map.empty[String, String]).as("r"))
      .select(col("r.*")))

  /** S4 end-to-end: Kafka topic of CSV lines → typed UserBehavior stream —
    * the reference's `FlinkKafkaConsumer` + parse-map pipeline
    * (`HotItems.scala:39-52`).
    */
  def kafkaUserBehavior(
      spark: SparkSession, servers: String, topic: String): DataFrame =
    parseUserBehaviorLines(kafkaLines(spark, servers, topic))
}
