ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "flinkubaspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// Bench-tail re-emission (driver contract): the bench driver keeps the
// last ~2000 chars of stdout and JSON-parses the LAST line, but sbt
// prints "[success] Total time: …" AFTER the forked runMain's output, so
// nothing graft.Bench prints can ever be that last line. This hook runs
// in the SBT JVM at exit — after every sbt log line — and re-prints the
// compact ≤1800-char summary graft.Bench wrote THIS session (mtime-gated
// so compile/test/Verify invocations stay silent; property-gated so a
// build reload doesn't stack duplicate hooks).
val benchTailHook: Unit =
  if (System.getProperty("graft.benchTailHook") == null) {
    System.setProperty("graft.benchTailHook", "1")
    val sbtStart = System.currentTimeMillis()
    java.lang.Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try {
        val p = java.nio.file.Paths.get("/tmp/bench_tail.json")
        if (java.nio.file.Files.exists(p) &&
            java.nio.file.Files.getLastModifiedTime(p).toMillis >= sbtStart) {
          System.out.println(new String(
            java.nio.file.Files.readAllBytes(p),
            java.nio.charset.StandardCharsets.UTF_8).trim)
          System.out.flush()
        }
      } catch { case _: Throwable => () }
    }))
  }
