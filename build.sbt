ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "confluentksqlcharmspark"
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
// Forked run output passes straight to stdout with NO "[info] " prefix —
// Bench prints one machine-readable JSON line that downstream tooling
// parses; the sbt logger prefix would corrupt it.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // shuffle/broadcast/spill files on tmpfs: the default /tmp sits on a
  // virtio disk here and the per-round bench measured MORE sys time than
  // user time (8m vs 6.5m) — a syscall storm from temp-file traffic.
  // On a real cluster this is the standard local-SSD/ramdisk scratch.
  // Overridable (SPARK_LOCAL_DIR), and only defaulted to /dev/shm when
  // it actually exists with headroom — on hosts with a small or absent
  // /dev/shm (container tmpfs is often far below the 50%-of-RAM
  // default), forcing shuffle spill onto tmpfs trades disk spill for
  // hard no-space failures, so fall back to the JVM default /tmp there.
  s"-Dspark.local.dir=${sys.env.getOrElse("SPARK_LOCAL_DIR", {
    val shm = file("/dev/shm")
    // 8 GiB usable floor: below that, sf0.1 shuffle traffic fills tmpfs
    if (shm.isDirectory && shm.getUsableSpace > 8L * 1024 * 1024 * 1024)
      "/dev/shm/spark-local"
    else sys.props.getOrElse("java.io.tmpdir", "/tmp")
  })}",
  // 32g default: Bench overlaps 8 shuffling queries in one JVM; with 8g
  // the old-gen fills and concurrent GC storms inflate wall-clock 2-4x
  // (measured 112-160 s vs 75 s at sf0.1 on a 32-core/128 GB box)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
