package graft
import org.apache.spark.sql.SparkSession
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    for (q <- args) {
      val fn = SparkEntry.queries(q)
      for (i <- 0 until runs) {
        val t0 = System.nanoTime()
        val rows = fn(spark, dir).collect()
        println(s"TIME $q run$i ${math.rint((System.nanoTime()-t0)/1e6)/1000}s")
        if (sys.env.contains("SPARK_GRAFT_SHOW"))
          println(s"ROWS $q ${rows.take(20).mkString("; ")}")
        GraftCache.releaseAll(); System.gc()
      }
    }
    spark.stop()
  }
}
