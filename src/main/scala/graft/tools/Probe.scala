package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dup-heavy scaling probe (SCALE.md §8): replicates the documents table
  * `copies`× with fresh doc_ids — the shape a crawl corpus presents to a
  * dedup stack, where EVERY document has exact near-identical copies — and
  * times the dedup-family registry queries on the base and replicated
  * corpora (3 runs each, cache-cleared, medians). A query whose cost
  * tracks true duplicate mass stays ~linear; anything inheriting the dup²
  * join blows up here long before it would at 100 TB.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.Probe"
  */
object Probe {
  private val ProbeQueries = Seq(
    "dedup_exact", "dedup_simhash", "dedup_minhash_lsh", "dedup_clusters",
    "decontamination", "ngram_jaccard", "text_repetition", "doc_chunks",
    "substring_dup_rate", "semantic_dedup")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_PROBE_COPIES", "4").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val probeDir = s"/tmp/graft_probe_${copies}x"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    (0 until copies).map(k =>
        base.withColumn("doc_id", col("doc_id") + lit(k * 10000000L)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$probeDir/documents.parquet")
    // same dup-heavy shape for the embedding side (every vector `copies`×,
    // fresh ids); query/seed sets (vec_id < 20/16) keep only the originals
    val eBase = spark.read.parquet(s"$sfDir/embeddings.parquet")
    (0 until copies).map(k =>
        eBase.withColumn("vec_id", col("vec_id") + lit(k * 10000000L)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$probeDir/embeddings.parquet")

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def time(name: String, dir: String): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    spark.range(1000000L).selectExpr("sum(id)").collect() // JVM warmup

    println(f"${"query"}%-20s ${"base"}%8s ${copies + "x"}%8s  ratio")
    ProbeQueries.foreach { q =>
      val b = median((1 to 3).map(_ => time(q, sfDir)))
      val p = median((1 to 3).map(_ => time(q, probeDir)))
      println(f"$q%-20s $b%8.2f $p%8.2f  ${p / b}%.1fx")
    }
    spark.stop()
  }
}
