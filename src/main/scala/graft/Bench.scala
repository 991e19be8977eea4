package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM (codegen, shuffle, parquet reader paths).
    spark.read.parquet(s"$sfDir/region.parquet").repartition(4).groupBy("r_name").count().count()
    SparkEntry.entry(spark).count()
    // Per query: first (cold) run pays whole-stage-codegen compilation
    // of that plan (~1-3s each, measured; data compute at sf0.1 is a
    // fraction of it); second run is steady-state. Report warm as the
    // headline (a 100 TB cluster amortizes compilation), cold in
    // queries_cold for transparency.
    // A failing query must be VISIBLE in the output, not silently fast:
    // its elapsed time is still recorded and the error lands in the
    // "errors" object (sanitized for JSON).
    def timed(f: => Unit): (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val err = try { f; None } catch {
        case e: Throwable =>
          Some((e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage).take(200))
            .replaceAll("[\"\\\\]", "'").replaceAll("[^\\x20-\\x7e]+", " "))
      }
      ((System.nanoTime() - t0) / 1e9, err)
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (cold, coldErr) = timed(fn(spark, sfDir).count())
      val (warm, warmErr) = timed(fn(spark, sfDir).count())
      (name, cold, warm, coldErr.orElse(warmErr))
    }
    def fmt(xs: Seq[(String, Double)]) =
      xs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val warmQs = fmt(results.map(r => r._1 -> r._3))
    val coldQs = fmt(results.map(r => r._1 -> r._2))
    val errs = results.collect { case (n, _, _, Some(e)) => "\"" + n + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val warmTotal = results.map(_._3).sum
    val coldTotal = results.map(_._2).sum
    val json = s"""{"metric":"total","value":$warmTotal,"unit":"sec","queries":$warmQs,"cold_total":$coldTotal,"queries_cold":$coldQs,"errors":$errs,"mode":"warm(steady-state); cold=first-run incl. codegen compile","sf":"$sfDir"}"""
    println(json)
    // Also persist to a file: stdout alone is fragile under sbt's log
    // interleaving (the driver saw "parsed": null two rounds running).
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
