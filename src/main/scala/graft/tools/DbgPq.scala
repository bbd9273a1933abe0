package graft.tools
import org.apache.spark.sql.functions._
object DbgPq {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val e = graft.sources.Tables.embeddings(s, d)
    val cent = graft.operators.Ann.sampleCentroids(e, 8)
    val cbs = graft.operators.Ann.pqTrain(e, 4, 8, 1)
    val enc = graft.operators.Ann.pqEncodeWithCells(e, cbs, cent)
    println("enc cells for 365, 48, 0:")
    enc.filter(col("vec_id").isin(365L, 48L, 0L)).show(false)
    println("assignCells for same:")
    graft.operators.Ann.assignCells(e, cent).filter(col("vec_id").isin(365L,48L,0L)).show(false)
    println("codebook cids: ")
    cbs.select("m","cid").show(40, false)
  }
}
