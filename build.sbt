ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datalakemedallionarchitectureprojectspark"
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
// Pass the forked process's stdout through verbatim: sbt's default logger
// prefixes every line with [info]/[error], which breaks machine parsing of
// Bench/Verify's single JSON output line (BENCH_r0{1,2,3}.json all show
// "parsed": null because the line arrived as `[info] {"metric":...}`).
run / outputStrategy := Some(StdoutOutput)
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
  // local-mode Spark = driver-only: the heap is the only memory knob. ~40 queries
  // run sequentially in one JVM; 8g caused GC-dominated run-to-run swings (3s
  // queries ballooning to 40s), and at local[32] even 24g showed late-run GC
  // coupling. The box has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // 351 queries' whole-stage-codegen classes overflow the default 240 MB JIT
  // code cache late in a full-suite run; once it fills (flushing churn), C2
  // stops keeping hot loops compiled and the FLOP-dense queries degrade
  // 2.5-4x IN-SUITE while running at reference speed in a fresh JVM (round-13
  // close: q218 17.6s in-suite vs 8.1s fresh, q28 2.2s vs 0.7s, q331 2.6s vs
  // 1.9s — reproducible across two full runs, code ruled out by a same-window
  // old-vs-new worktree A/B). Headroom restores in-suite = fresh-JVM.
  "-XX:ReservedCodeCacheSize=512m",
)
