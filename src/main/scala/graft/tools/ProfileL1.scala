package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{text => T}
import graft.sources.Tables

/** Dev-only stage profiler for the minhash pipeline (not part of the engine). */
object ProfileL1 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.openCostInBytes", "131072")
      .config("spark.sql.files.minPartitionNum", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"STAGE $name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }

    val docs = Tables.documents(spark, d).select(col("doc_id"), T.normKey(col("text")).as("t"))
    val corpus = docs.select(col("doc_id").as("id"), col("t"))
      .unionAll(docs.select((col("doc_id") + 1000000L).as("id"),
        concat(col("t"), lit(" extraword")).as("t")))

    // replicate minhashPairs stages (k=16, bands=4, cap=1000)
    val k = 16
    val toks = corpus.select(col("id"), posexplode(split(col("t"), " ")).as(Seq("pos", "tok")))
    val w = Window.partitionBy("id").orderBy("pos")
    val parts = col("tok") +: (1 until 3).map(j => lead("tok", j).over(w))
    val sh = toks.select(col("id"), when(parts.last.isNotNull, concat_ws(" ", parts: _*)).as("s"))
      .filter(col("s").isNotNull)
      .select(col("id"), concat(md5(col("s")), md5(concat(col("s"), lit("#1"))),
        md5(concat(col("s"), lit("#2"))), md5(concat(col("s"), lit("#3")))).as("hs"))
    time("shingle-hash")(sh)
    val mins = (0 until k).map(j => min(substring(col("hs"), j * 8 + 1, 8)).as(s"m$j"))
    val aggs = mins :+ collect_set(col("hs")).as("hset")
    val sigSets = sh.groupBy("id").agg(aggs.head, aggs.tail: _*)
    time("sig+sets")(sigSets)
    val bandKeys = (0 until 4).map(b =>
      md5(concat_ws("#", (0 until 4).map(r => col(s"m${b * 4 + r}")): _*)))
    val bandsDf = sigSets.select(col("id"), posexplode(array(bandKeys: _*)).as(Seq("b", "bh")))
    time("bands")(bandsDf)
    val capped = bandsDf
      .withColumn("n_bucket", count(lit(1)).over(Window.partitionBy("b", "bh")))
      .filter(col("n_bucket") <= 1000)
      .select("id", "b", "bh")
    time("capped")(capped)
    val rawPairs = capped.as("a").join(capped.as("b"),
      col("a.b") === col("b.b") && col("a.bh") === col("b.bh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
    time("raw-pairs")(rawPairs)
    val cand = rawPairs.distinct()
    time("cand-distinct")(cand)
    time("verified") {
      cand.join(sigSets.select(col("id").as("id1"), col("hset").as("h1")), "id1")
        .join(sigSets.select(col("id").as("id2"), col("hset").as("h2")), "id2")
        .select(col("id1"), col("id2"), T.jaccard(col("h1"), col("h2")).as("jaccard"))
        .filter(col("jaccard") >= 0.8)
    }
    time("full-operator")(graft.operators.Dedup.minhashPairs(
      corpus, "id", "t", shingleN = 3, k = 16, bands = 4, threshold = 0.8))
    spark.stop()
  }
}
