ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "doc2datasetspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Zinc normally source-compiles its compiler bridge on first use and
// caches it under ~/.sbt/1.0/zinc; if that cache is evicted mid-session
// the offline coursier cache has no bridge SOURCES jar and compilation
// dies. Scala 2.13.12+ ships a PRECOMPILED bridge (scala2-sbt-bridge)
// which the cache does carry — pin it so the build never needs the
// source-compile path.
scalaCompilerBridgeBinaryJar := {
  // Glob the coursier cache host-agnostically: whatever mirror warmed the
  // cache, the bridge jar's file name is stable.
  val v = scalaVersion.value
  val cache = file(sys.env.getOrElse("HOME", "/root")) / ".cache/coursier/v1"
  (cache ** s"scala2-sbt-bridge-$v.jar").get().headOption.filter(_.isFile)
}
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
  // The JDK-17 default 240 MB code cache (segmented ~117 MB per heap)
  // evicts C2-compiled methods under a multi-hundred-query suite's
  // codegen load — measured CodeHeap peaks 119+104 MB, right at the
  // default segment limits. Controlled A/B on a fixed 111-query
  // subset: q361 (non-codegen ImageIO hot loop, zero GC/retries)
  // 4.3 s at default → 2.7 s at 512 MB → 1.7 s ≈ solo-warm at 1 GB.
  // (At the full 366-query scale q361 retains a ~2× in-suite JIT
  // re-warm residual regardless of cache size — attributed by the
  // bench telemetry, not a plan issue; reservation is virtual address
  // space, committed lazily, so 1 GB costs nothing when unused.)
  "-XX:ReservedCodeCacheSize=1g",
)
