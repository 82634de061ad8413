package graft
import org.apache.spark.sql.SparkSession

/** Diagnostic main: physical-plan shape summary (scan/exchange/join node
  * counts) for the heaviest queries — the quick audit loop for spotting a
  * regression to re-scans, lost broadcasts, or accidental cartesians.
  * `sbt "runMain graft.PlanDump"`. Static counts include cached subtrees'
  * lineage, so read them relative to a known-good run, not as absolutes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (n <- names) {
      println(s"\n========== $n ==========")
      val p = SparkEntry.queries(n)(spark, sf).queryExecution.executedPlan.toString
      // summarize: count scans, exchanges, joins
      val scans = "Scan parquet|FileScan".r.findAllIn(p).length
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      val bcast = "BroadcastExchange".r.findAllIn(p).length
      val smj = "SortMergeJoin".r.findAllIn(p).length
      val bhj = "BroadcastHashJoin".r.findAllIn(p).length
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
      val cart = "CartesianProduct".r.findAllIn(p).length
      val reuse = "ReusedExchange|InMemoryTableScan".r.findAllIn(p).length
      println(s"scans=$scans hashExchanges=$exchanges broadcasts=$bcast SMJ=$smj BHJ=$bhj BNLJ=$bnlj cartesian=$cart cachedReads=$reuse")
    }
    spark.stop()
  }
}
