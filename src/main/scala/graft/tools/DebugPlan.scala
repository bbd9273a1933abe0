package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch main for inspecting optimized plans. */
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.openCostInBytes", "16384")
      .config("spark.sql.files.minPartitionNum", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val slow = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        if (ms > 1500) slow.add(f"stage ${si.stageId}%4d ${ms / 1000.0}%7.2f s  tasks=${si.numTasks}  ${si.name.take(90)}")
      }
    })
    val d = "/root/testdata/sf0.1"
    val docs = graft.sources.Tables.documents(spark, d)
      .select(col("doc_id"), graft.functions.text.normKey(col("text")).as("t"))
    val corpus = docs.select(col("doc_id").as("id"), col("t"))
      .unionAll(docs.select((col("doc_id") + 1000000L).as("id"),
        concat(col("t"), lit(" extraword")).as("t")))
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
      var s = slow.poll(); while (s != null) { println("   " + s); s = slow.poll() }
    }
    corpus.count()
    for (r <- 1 to 8) {
      time(s"minhash-$r") { graft.operators.Dedup.minhashPairs(corpus, "id", "t", 3, 16, 4, 0.8).count() }
    }
    spark.stop()
  }
}
