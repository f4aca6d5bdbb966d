package graft
import org.apache.spark.sql.SparkSession
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    println("docs scan partitions = " + Tables.documents(spark, dir).rdd.getNumPartitions)
    println("lineitem scan partitions = " + Tables.lineitem(spark, dir).rdd.getNumPartitions)
    println("defaultParallelism = " + spark.sparkContext.defaultParallelism)
    spark.stop()
  }
}
