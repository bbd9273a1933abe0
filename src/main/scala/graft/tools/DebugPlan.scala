package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch main for inspecting optimized plans and per-stage
 *  time of the queries under tuning. Args: query names (default l1). */
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.openCostInBytes", "16384")
      .config("spark.sql.files.minPartitionNum", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        val scopes = si.rddInfos.flatMap(_.scope).map(_.name).distinct.mkString(">")
        if (ms > 300) stages.add(f"stage ${si.stageId}%4d ${ms / 1000.0}%7.2f s  tasks=${si.numTasks}  ${scopes.take(140)}")
      }
    })
    val names = if (args.nonEmpty) args.toSeq else Seq("l1_dedup_minhash")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
      var s = stages.poll(); while (s != null) { println("   " + s); s = stages.poll() }
    }
    for (name <- names; r <- 1 to 4) {
      val df = graft.queries.Catalog.byName(name).run(spark, d)
      time(s"$name-$r") { df.count() }
      if (r == 2 && sys.env.contains("DEBUG_PLAN_EXPLAIN")) {
        df.collect() // materialize THIS QueryExecution so AQE finalizes it
        println(df.queryExecution.executedPlan.toString.take(20000))
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
