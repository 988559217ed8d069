ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sstablemigratorspark"
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
  // Fixed-size heap + pinned collector (r17 verdict #5): with the
  // default growable heap, GC ergonomics re-tier the region/heap
  // geometry mid-sweep — PERF r17 caught whole-sweep +25-60% modes
  // with flat run vectors whose only discriminator was gc_sec 7.3 vs
  // 5.2. -Xms = -Xmx removes heap resizing; naming G1 removes any
  // collector-selection ergonomics. Applies to every forked main
  // (Bench, Verify, probes) and the test JVM alike.
  // NOTE -Xms = -Xmx COMMITS the full 8 GB at JVM start: on a box with
  // less free memory the JVM fails to launch where -Xmx-only worked.
  // SPARK_DRIVER_MEM is the knob — e.g. SPARK_DRIVER_MEM=2g sbt test
  // on a constrained machine (documented in README; timings are only
  // comparable at the default 8g).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+UseG1GC",
  // The 196-query bench sweep generates codegen classes continuously
  // and was measured at 170 MB of the JDK's 240 MB code-cache default
  // (r19 bench artifact, jit_sec/codecache_mb fields) — close enough
  // to the flush/disable cliff that one more round of queries could
  // cross it and silently de-JIT hot rows mid-sweep. Double the
  // reserve; same pinned-not-ergonomic rationale as the heap.
  // Env-parametric (default unchanged) so the r19->r20 drift probes
  // can A/B the JDK default without editing the build.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODECACHE", "512m")}",
)
