ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "coolplaydruidspark"
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
run / connectInput := true
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
  // local[32] packs the driver AND all 32 task slots into ONE JVM: the old
  // 8g default gave ~250 MB of heap per concurrent task — far below the
  // 1-4 GB/core a production executor runs with — and the dedup/LM-scoring
  // family measured 8 Full GCs + 100ms+ "G1 Preventive Collection" pauses
  // in a 5-query sweep, degrading chaotically across a full 98-query run
  // (adjacent-window A/B at sf0.1: q63 1.66→1.11 s, q96 1.22→0.84, q64
  // 1.21→0.92, q62 0.61→0.51 at 24g, flat CPU canary). 24g ≈ 0.75 GB/core
  // keeps local-mode per-task memory within sight of production sizing on
  // this 128 GiB box; env-overridable for smaller hosts.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // HotSpot permanently bans a method from C2 after 400 deopt→recompile
  // cycles ("made not compilable") — at >=10x the test row volume Spark's
  // generated iterator code can cross that budget mid-run, leaving hot
  // query loops interpreted FOREVER in that JVM (measured: the q23 dedup
  // pipeline at a 10x SF decayed 19s → 90-500s run-to-run, and recovered
  // to a stable 8-18s with the cutoff raised). Executors on a real
  // cluster process orders of magnitude more rows per JVM, so ship the
  // raised cutoff with every runnable main.
  "-XX:PerMethodRecompilationCutoff=10000",
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(_.split("\\s+"))
