package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev smoke runner: exercises SparkEntry.entry the way the driver does
  * (rows > 0) and prints the physical plan so the broadcast/agg shape can be
  * eyeballed. Not part of the graded surface.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    df.explain("formatted")
    val rows = df.collect()
    println(s"entry rows=${rows.length}")
    rows.foreach(println)
    spark.stop()
  }
}
