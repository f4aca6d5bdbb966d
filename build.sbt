ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "scrappyspark"
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
  // Pre-fault the whole heap at JVM start instead of letting first-touch
  // page faults land inside the first allocation-heavy queries: on a
  // ~90 GiB bench heap the fault storm was measured to cost the banded
  // interning queries 2-4x (q137 9.58 s -> 3.00 s min-of-2 standalone at
  // SPARK_DRIVER_MEM=90g; see BASELINE.md round-11 reconciliation). The
  // startup cost moves to JVM init, outside every timed query.
  "-XX:+AlwaysPreTouch",
)
// r17: the r16 verification run's `sbt test` died as ONE 756 s forked JVM
// (exit 56, no suite named in the tail — sbt buffers each suite's output
// until the suite completes, so a dying fork prints nothing useful).
// Three containments:
//   1. stream suite output as it happens, so a fork death names the
//      suite that was running;
Test / logBuffered := false
//   2. tests get their own bounded heap — local[4] over sf0.001 fixtures
//      never needs the bench's heap envelope, and AlwaysPreTouch would
//      only pre-fault pages per shard for nothing;
Test / javaOptions := jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_GRAFT_TEST_MEM", "4g")}",
)
//   3. shard the suites into a few forked JVMs: bounds each fork's
//      lifetime (cumulative codegen-class/metaspace growth over a 12-min
//      single JVM is the prime exit-56 suspect), keeps one crash from
//      erasing every other shard's verdict, and the failing shard is
//      named in sbt's error line. Round-robin over sorted names is
//      deterministic and spreads the alphabetically-adjacent Corpus*
//      heavies across shards.
Test / testGrouping := {
  val shards = 4
  val opts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
  (Test / definedTests).value.sortBy(_.name).zipWithIndex
    .groupBy(_._2 % shards).toSeq.sortBy(_._1)
    .map { case (i, ts) =>
      Tests.Group(s"shard-$i", ts.map(_._1), Tests.SubProcess(opts))
    }
}
// Two shards in flight: roughly halves the test wall vs sequential
// shards without oversubscribing the host (each shard is a local[4]
// session over tiny fixtures).
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 2),
  Tags.limitAll(math.max(4, java.lang.Runtime.getRuntime.availableProcessors())),
)
