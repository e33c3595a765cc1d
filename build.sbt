ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dibimbingcasestudyetlspark"
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
// OracleInitSpec runs in its OWN forked JVM (r17 advice): in the shared
// test JVM an alphabetically earlier suite (OpqSpec) initializes
// Opq -> Pq -> Similarity in the benign downstream-first order, making
// that spec's "force Similarity's init FIRST" a no-op — isolated, the
// hazardous init order is genuinely exercised every run.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / forkOptions).value
  val (isolated, rest) = tests.partition(_.name == "graft.OracleInitSpec")
  Seq(
    Tests.Group("oracle-init-own-jvm", isolated, Tests.SubProcess(opts)),
    Tests.Group("main", rest, Tests.SubProcess(opts)),
  )
}
// Forward the forked process's stdout verbatim (no [info] prefix) so
// Bench/Verify's single JSON output line stays machine-parseable.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
