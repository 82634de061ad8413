package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Write `.explain("formatted")` for named queries to files — the
  * round-16 plan-evidence capture (`plans/r16/<query>_<tag>.txt`).
  *
  * Usage: sbt "runMain graft.tools.PlanSnap <outDir> <tag> q1 [q2 ...]"
  * Runs on sf0.001 (plan SHAPE is SF-independent; fixtures stay cheap).
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanSnap <outDir> <tag> <query>...")
    // r16 verdict item: without plan-only mode, eager-checkpointed
    // (slim-handoff) queries EXECUTE their pipeline during plan
    // construction and the captured plan is a single ExistingRDD scan —
    // no lineage, vacuous evidence. Mirror PlanAudit.
    graft.ops.Eager.planOnly = true
    val outDir = Paths.get(args(0)); val tag = args(1)
    val names = args.drop(2).toSeq
    Files.createDirectories(outDir)
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxPlanStringLength", (8 << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_PLAN_MODE=simple shows the *(n) WholeStageCodegen span
    // markers FormattedMode omits (the r17 codegen-coverage evidence).
    val mode = sys.env.getOrElse("SPARK_GRAFT_PLAN_MODE", "formatted") match {
      case "simple" => org.apache.spark.sql.execution.SimpleMode
      case _ => org.apache.spark.sql.execution.FormattedMode
    }
    names.foreach { name =>
      spark.catalog.clearCache()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(mode)
      Files.write(outDir.resolve(s"${name}_$tag.txt"),
        txt.getBytes(StandardCharsets.UTF_8))
      println(s"[plansnap] wrote ${name}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
