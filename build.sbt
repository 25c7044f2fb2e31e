ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "jsonschemaspark"
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
  // Java 17 derives the default charset from the locale (JEP 400 lands in
  // 18); under a POSIX/C locale that is US-ASCII, and Spark's variant
  // parse_json/variant_get path decodes string bytes through the DEFAULT
  // charset — every non-ASCII byte becomes U+FFFD, silently corrupting
  // multibyte strings in dynamic-mode validation. Pin UTF-8 everywhere.
  "-Dfile.encoding=UTF-8", "-Dsun.jnu.encoding=UTF-8",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // G1's default tiny young gen collapses under allocation-heavy local[32]
  // runs (measured 14x slowdown on the decode pass); ParallelGC with a
  // half-heap young gen restores thread scaling.
  "-XX:+UseParallelGC", "-XX:NewRatio=1",
) ++ sys.env.get("GRAFT_GC_LOG").map(_ => "-Xlog:gc").toSeq ++
  sys.env.get("GRAFT_JAVA_OPTS").toSeq.flatMap(_.split(" ").toSeq)
