package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev-only (r19): listener-based evidence that a query's heavy
  * stages actually parallelize — per-query job count, per-stage task
  * counts and task-time totals. Two uses:
  *
  *  - VERDICT r18 item 1: stage-level task-count proof that the
  *    barrier'd pipelines run their post-barrier stages with >1 task
  *    (the single-row-group fixtures cap SCAN stages at 1 task; the
  *    claim to prove is that the work after the keyed exchange fans
  *    out).
  *  - VERDICT r18 item 6: jobs-per-lifecycle for the CQL statement
  *    scripts (each statement used to schedule its own read/write
  *    jobs; this counts them before/after fusion work).
  *
  *   tools/run.sh graft.tools.StageStats <sfDir> <q1,q2,...> [runs]
  *
  * Prints one line per run: jobs, stages, tasks, then the top stages
  * by task time as (numTasks, taskTimeMs, wallMs). Run 1 includes
  * plan/codegen warm-up; compare run 2+ across `SPARK_GRAFT_CPUS`
  * values for the scaling story.
  */
object StageStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages =
      mutable.ArrayBuffer[(Int, Int, Long, Long)]() // id, nTasks, taskMs, wallMs
    val stageNames = mutable.Map[Int, String]() // stageId -> top RDD scopes
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageCompleted(
          sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += ((si.stageId, si.numTasks,
            si.taskMetrics.executorRunTime, wall))
          stageNames(si.stageId) = si.rddInfos.sortBy(_.id)
            .map(_.name.takeWhile(_ != '\n').take(40))
            .distinct.take(6).mkString(">")
        }
        ()
      }
    })
    // ICU warm-up (same trap Bench pre-pays).
    spark.range(64).repartition(64)
      .selectExpr("lower('Warm')", "md5('warm')").collect()
    names.foreach { n =>
      val fn = graft.Registry.byName(n).fn
      (1 to runs).foreach { r =>
        Thread.sleep(300) // drain listener bus from the previous run
        jobs.set(0); stages.synchronized(stages.clear())
        val t0 = System.nanoTime()
        val c = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500) // listener events are async
        val snap = stages.synchronized(stages.toList)
        val nTasks = snap.map(_._2).sum
        val top = snap.sortBy(-_._3).take(8).map { case (id, nt, tm, w) =>
          s"(s$id tasks=$nt taskMs=$tm wallMs=$w ${stageNames.getOrElse(id, "?")})"
        }.mkString(" ")
        println(f"[stagestats] $n cpus=$cpus run$r: ${dt}%.2fs rows=$c " +
          s"jobs=${jobs.get()} stages=${snap.size} tasks=$nTasks | $top")
        try spark.catalog.clearCache() catch { case _: Throwable => }
      }
    }
    spark.stop()
  }
}
