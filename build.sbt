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
// Per-test durations in the report (-oD): the r14 driver-side `sbt test`
// run was killed mid-suite with no summary; knowing where the wall time
// goes is now operationally load-bearing (VERDICT r14 #2).
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
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
  // for runs whose spill volume rivals physical RAM.
  //
  // Each sbt invocation gets its OWN run-<pid> subdir, and reclaim only
  // ever touches run-<pid> dirs whose stamping sbt process is dead. The
  // old scheme (one shared dir, wiped whole at every sbt load) deleted
  // shuffle files out from under any STILL-RUNNING sibling JVM — a
  // concurrent `sbt runMain` didn't just skew a measurement, it killed
  // the other run with FileNotFoundException mid-stage (observed r12:
  // a profile run wiped a live Verify's blockmgr dirs).
  {
    val base = sys.env.getOrElse("SPARK_GRAFT_TMPDIR",
      if (file("/dev/shm").isDirectory) "/dev/shm/graft-tmp" else "")
    if (base.nonEmpty) {
      val parent = file(base)
      // Legacy layout migration: the pre-r12 scheme stamped the parent
      // itself (marker = we created it, per ADVICE r10/r11 — never wipe
      // a pre-existing user dir). Reclaim it wholesale ONCE, then rebuild
      // as the container for per-run subdirs.
      if (parent.getName == "graft-tmp" && (parent / ".graft-tmp").exists)
        IO.delete(parent)
      IO.createDirectory(parent)
      // Reap per-run dirs stamped by a previous build whose sbt process
      // is gone (killed runs, crashed boxes). A live pid — ANY live pid,
      // to stay conservative across pid reuse — is never touched, so
      // concurrent sbt sessions can no longer corrupt each other. Only
      // dirs both named run-<digits> AND carrying our marker qualify:
      // foreign files in a user-supplied SPARK_GRAFT_TMPDIR are never
      // deleted.
      Option(parent.listFiles()).getOrElse(Array.empty[File]).foreach { f =>
        val pid = f.getName.stripPrefix("run-")
        if (f.isDirectory && f.getName.startsWith("run-") &&
            pid.nonEmpty && pid.forall(_.isDigit) &&
            (f / ".graft-tmp").exists &&
            !ProcessHandle.of(pid.toLong).isPresent)
          IO.delete(f)
      }
      val dir = parent / s"run-${ProcessHandle.current().pid()}"
      val d = dir.getAbsolutePath
      IO.createDirectory(dir)
      IO.touch(dir / ".graft-tmp")
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