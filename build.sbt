ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "llmxmapreducespark"
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
// Pass the forked JVM's stdout straight through: sbt's default LoggedOutput
// prefixes every line with "[info] ", which breaks the driver's parse of
// Bench's single JSON line (BENCH_r02 recorded parsed:null for exactly this).
outputStrategy := Some(StdoutOutput)
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
  // Throughput GC for a batch/bench workload: G1's pause-time goal costs
  // ~20% cold / ~7% warm on the 125-query suite at local[32] (measured
  // A/B via graft.tools.ConfExperiment); nothing here is latency-bound.
  "-XX:+UseParallelGC",
  // 20g headroom keeps full GCs out of the hot loop with 32 executor
  // threads sharing one JVM (8g measured ~11% slower cold).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "20g")}",
) ++
  // tmpfs redirect for the forked JVM's temp dir: streaming queries
  // without an explicit checkpointLocation put their per-trigger
  // offset/commit logs and state snapshots under java.io.tmpdir, and on
  // this box /tmp is disk-backed ext4, so that fsync traffic is part of
  // the per-trigger floor. A/B (ConfExperiment, 21 streaming queries,
  // A-B-A-B warm reps): disk 19.5-20.6 s vs tmpfs 18.5-19.8 s, a
  // consistent ~5%. Cluster deployments pin streaming checkpoints to
  // reliable storage explicitly — this only tunes the local-mode temp
  // path. SPARK_GRAFT_TMPDIR overrides; empty value disables.
  //
  // Scope: java.io.tmpdir is ALSO the local-mode default for
  // spark.local.dir, i.e. shuffle files and disk spills — and since the
  // r11 A/B (17-21% floor shift, see below) shuffle deliberately RIDES
  // this tmpfs default. SPARK_GRAFT_LOCAL_DIR is the disk escape hatch
  // for runs whose spill volume rivals physical RAM. The stale graft-tmp
  // of a previous (possibly killed) run is deleted at sbt load — safe
  // under the measurement discipline of never running two graft JVMs
  // concurrently.
  {
    val d = sys.env.getOrElse("SPARK_GRAFT_TMPDIR",
      if (file("/dev/shm").isDirectory) "/dev/shm/graft-tmp" else "")
    if (d.nonEmpty) {
      val dir = file(d)
      val marker = dir / ".graft-tmp"
      // Only reclaim a dir named graft-tmp that THIS build previously
      // stamped (marker present): a recursive delete of an arbitrary
      // user-supplied path — /tmp, a shared scratch dir — would silently
      // wipe unrelated data (ADVICE r10, medium). The basename guard is
      // load-bearing ON TOP of the marker, and the marker itself is only
      // stamped on a dir this build CREATED (ADVICE r11: stamping a
      // pre-existing user dir that happens to be named graft-tmp would
      // make it — user data included — deletable on the next load). A
      // fresh or foreign dir is used as-is, never stamped, never wiped.
      val hadMarker = marker.exists
      if (dir.getName == "graft-tmp" && hadMarker) IO.delete(dir)
      val created = !dir.exists
      IO.createDirectory(dir)
      if (dir.getName == "graft-tmp" && (created || hadMarker))
        IO.touch(marker)
      // spark.local.dir (shuffle files + disk spills) FOLLOWS java.io.tmpdir
      // — i.e. shuffle rides the tmpfs default. The r10 pin back to /tmp
      // was A/B'd this round (ScaleBench heavy15 sf0.1, A-B-A-B interleaved
      // sessions): disk 17.0/18.1 s vs tmpfs 14.8/14.2 s — a consistent
      // 17-21%, a real floor shift, not draw variance (and the likely bulk
      // of r10's 60→75 s bench drift). The r9-advisory RAM-competition
      // concern applies to runs whose spill volume rivals physical RAM:
      // for 100×+ corpora set SPARK_GRAFT_LOCAL_DIR to a disk path (the
      // measured sf10 shuffle peaks at a few GB against 126 GB of tmpfs,
      // so even those are safe on this box). A user-supplied DISK
      // SPARK_GRAFT_TMPDIR keeps spills on that disk (ADVICE r10: never
      // shunt them onto a possibly-small /tmp).
      sys.env.get("SPARK_GRAFT_LOCAL_DIR").filter(_.nonEmpty)
        .map(p => Seq(s"-Djava.io.tmpdir=$d", s"-Dspark.local.dir=$p"))
        .getOrElse(Seq(s"-Djava.io.tmpdir=$d"))
    } else Seq.empty
  }