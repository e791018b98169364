package graft.tools
import graft._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger
object JobCount {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("job-count", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val n = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = n.incrementAndGet()
    })
    SparkEntry.queries("p02_v2_survey_pipeline")(spark, d).count()
    Thread.sleep(200)
    val warm = n.get()
    println(s"JOBS p02 cold: $warm")
    n.set(0)
    SparkEntry.queries("p02_v2_survey_pipeline")(spark, d).count()
    Thread.sleep(200)
    println(s"JOBS p02 warm: ${n.get()}")
    spark.stop()
  }
}
