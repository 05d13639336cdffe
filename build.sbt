ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gigapipespark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // ~250 gate queries x several whole-stage-codegen classes each run in
  // ONE bench JVM; the JDK default 240m code cache fills mid-run and the
  // JIT falls back to interpreted for whatever compiles late — a uniform
  // tail-of-run slowdown that vanishes in isolated reruns. 512m sufficed
  // at ~190 queries; the 251-query surface runs against 1g (the r15 full
  // run at 512m degraded uniformly past mid-run — min-of-3 retries stayed
  // 2-8x pin on entries that reproduce AT pin in a small JVM)
  "-XX:ReservedCodeCacheSize=1g",
)
