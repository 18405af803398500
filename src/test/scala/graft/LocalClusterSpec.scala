package graft

import scala.jdk.CollectionConverters._

/** Cross-JVM gate inside `sbt test`: every other spec runs on the shared
  * single-JVM `local[4]` session, which cannot catch closure-serialization
  * failures, non-serializable captures, broadcast transport, or
  * executor-classpath breakage. This spec launches
  * `graft.tools.LocalClusterRehearsal spec` in a FRESH JVM (a second
  * SparkContext cannot coexist in this one) whose driver brings up
  * `local-cluster[2,4,2048]` — two real executor JVMs — and asserts a
  * representative query slice, an ingest write/read cycle, and a streaming
  * commit with exact row accounting all hold across process boundaries. */
class LocalClusterSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("representative queries + ingest + streaming commit hold across executor JVMs") {
    val javaBin = new java.io.File(new java.io.File(
      System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx3g", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.LocalClusterRehearsal", "spec")).asJava
    val pb = new ProcessBuilder(cmd)
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val exit = proc.waitFor()
    val tail = out.linesIterator.toSeq.takeRight(40).mkString("\n")
    assert(exit == 0, s"cross-JVM rehearsal failed (exit $exit):\n$tail")
    assert(out.contains("[local-cluster] ALL PASS"), s"missing ALL PASS:\n$tail")
    // the gate is only meaningful if two REMOTE executors actually ran
    assert(out.contains("executors=0,1"), s"expected 2 remote executors:\n$tail")
  }
}
