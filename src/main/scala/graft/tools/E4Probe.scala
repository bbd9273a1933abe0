package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only profile of the e4 fuzzy-match catalog query. */
object E4Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.openCostInBytes", "131072")
      .config("spark.sql.files.minPartitionNum", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
        val m = si.taskMetrics
        if (dur > 0.5)
          println(f"[stage] id=${si.stageId} tasks=${si.numTasks} dur=$dur%.1f s " +
            f"cpu=${m.executorCpuTime / 1e9}%.1f gc=${m.jvmGCTime / 1e3}%.1f " +
            f"swB=${m.shuffleWriteMetrics.bytesWritten / 1e6}%.0fMB")
      }
    })
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val full = graft.queries.Catalog.byName("e4_fuzzy_match").run(spark, d)
    println("full=" + time("full e4 (cold)")(full.count()))
    println("full=" + time("full e4 (warm)")(full.count()))
    spark.stop()
  }
}
