package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders over the driver-generated parquet testdata
  * (`TESTDATA.md`): TPC-H-ish star schema + `events` + `documents` +
  * `embeddings`. Mirrors the reference's source surface
  * (`/root/reference/dampr/dampr.py:845-912` — memory/text/json taps)
  * re-expressed as Spark readers so Catalyst sees real schemas and can
  * push filters/prune columns into the parquet scan.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `Dampr.text` equivalent (`/root/reference/dampr/dampr.py:879-895`):
    * newline text over a file/dir/glob. Hadoop input splits replace the
    * reference's hand-rolled byte-range chunker + line realignment
    * (`/root/reference/dampr/dataset.py:458-471`); gzip and dir walking
    * come with the Hadoop codec/path machinery.
    */
  def text(spark: SparkSession, path: String): org.apache.spark.sql.Dataset[String] =
    spark.read.textFile(path)

  /** `Dampr.json` equivalent (`/root/reference/dampr/dampr.py:897-902`):
    * newline-delimited JSON with schema inference.
    */
  def json(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)
}
