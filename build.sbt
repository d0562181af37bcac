ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "merletlspark"
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
// 32 executor threads need headroom: an undersized heap turns GC into
// the dominant "compute" and makes bench numbers nondeterministic. But
// a fixed large default OOM-kills on smaller machines (the OS kills
// the process instead of the JVM GCing), so derive the default from
// physical RAM — half of it, capped at 48g — with SPARK_DRIVER_MEM as
// the explicit override for the bench environment.
val defaultHeap: String = {
  val physGb = java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
    case b: com.sun.management.OperatingSystemMXBean => (b.getTotalMemorySize >> 30).toInt
    case _ => 16
  }
  s"${math.max(2, math.min(48, physGb / 2))}g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap)}",
  // The bench runs ~47 queries x several whole-stage-codegen classes
  // each; the JVM's default 240 MB code cache fills, evicts hot
  // compiled methods, and the heaviest codegen consumers (the 64-wide
  // signature aggregates) pay measured 40-60% recompilation tax in
  // full runs that vanishes when they run alone.
  "-XX:ReservedCodeCacheSize=1g",
)
