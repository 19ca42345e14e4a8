package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd, SparkListenerStageCompleted}
import scala.collection.mutable

/** Optimization-round instrumentation (guide §1): run the named gate
  * queries once, with a listener that attributes wall time to Spark
  * jobs — job count, per-job duration, stage/task counts — so the
  * local-mode dispatch floor vs real work split is measurable instead
  * of guessed. Not part of the driver contract; Bench/Verify unchanged.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.Profile sfDir q329 q334"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val prefixes = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_FALLBACK_THRESHOLD", "4096"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    // same warmup as Bench
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    Option(new java.io.File(sfDir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
      .foreach { f =>
        try {
          val df = spark.read.parquet(f.getAbsolutePath)
          df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
        } catch { case _: Throwable => }
      }

    case class Job(id: Int, desc: String, start: Long, var end: Long = -1,
                   var stages: Int = 0, var tasks: Int = 0)
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs(e.jobId) = Job(e.jobId, desc, e.time)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = synchronized {
        val sid = e.stageInfo.stageId
        // attribute to the most recent unfinished job (approximation)
        jobs.values.lastOption.foreach { j =>
          j.stages += 1; j.tasks += e.stageInfo.numTasks
        }
      }
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.isEmpty || prefixes.exists(n.startsWith))
    names.foreach { name =>
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable => println(s"[$name] FAILED: ${e.getMessage}") }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      graft.plans.Blocks.releaseAll(spark)
      val done = jobs.values.toSeq.filter(_.end > 0)
      val jobSec = done.map(j => (j.end - j.start) / 1e3).sum
      println(f"== $name wall=$wall%.3f s, jobs=${done.size}, " +
        f"job-time=$jobSec%.3f s, gap=${wall - jobSec}%.3f s")
      done.sortBy(j => -(j.end - j.start)).take(12).foreach { j =>
        println(f"   job ${j.id}%4d ${(j.end - j.start) / 1e3}%7.3f s  " +
          f"stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.desc.take(80)}")
      }
    }
    spark.stop()
  }
}
