package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{text => T}
import graft.sources.Tables

/** Dev-only stage profiler for the minhash pipeline (not part of the engine). */
object ProfileL1 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // noop write: evaluates every column (no count() column pruning)
    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"STAGE $name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }

    val docs = Tables.documents(spark, d).select(col("doc_id"), T.normKey(col("text")).as("t"))
    val corpus = docs.select(col("doc_id").as("id"), col("t"))
      .unionAll(docs.select((col("doc_id") + 1000000L).as("id"),
        concat(col("t"), lit(" extraword")).as("t")))

    val rep = corpus.repartition(32)
    time("corpus-rep")(rep)
    val sh = rep.select(col("id"), T.wordShingles(split(col("t"), " "), 3).as("shingles"))
    time("shingles")(sh)
    val sig = sh.select(col("id"),
      T.minhashSignature(T.shingleHashes(col("shingles")), 8).as("mh"))
    time("signature")(sig)
    val bandsDf = sig.select(col("id"), posexplode(T.lshBands(col("mh"), 4, 2)).as(Seq("b", "bh")))
    time("bands")(bandsDf)
    time("full-operator")(graft.operators.Dedup.minhashPairs(
      corpus, "id", "t", shingleN = 3, k = 8, bands = 4, threshold = 0.8))
    spark.stop()
  }
}
