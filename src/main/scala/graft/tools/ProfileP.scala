package graft.tools

import graft.{GraftSession, SparkEntry, Tables}

/** p01/p02 repeat timing ("runMain graft.tools.ProfileP <sfDir>"). */
object ProfileP {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = GraftSession.get("graft-profile-p")
    s.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    s.range(1000000L).selectExpr("sum(id)").collect()
    Tables.names.foreach { t =>
      (if (t == "events") Tables.events(s, d) else Tables.load(s, d, t)).count()
    }
    (1 to 2).foreach { i =>
      time(s"p01 run$i")(SparkEntry.queries("p01_v1_qa_pipeline")(s, d).count())
      time(s"p02 run$i")(SparkEntry.queries("p02_v2_survey_pipeline")(s, d).count())
    }
    s.stop()
  }
}
