package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    SparkEntry.queries("q_agg_core")(spark, d).count() // warm
    for (name <- args) {
      val t0 = System.nanoTime()
      // noop sink like Bench: count() would let Catalyst prune the projections
      SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
      println(f"$name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
