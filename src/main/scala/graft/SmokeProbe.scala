package graft
import org.apache.spark.sql.SparkSession
/** Simulates the driver's smoke check: vanilla session (no graft confs),
  * calls SparkEntry.entry, expects rows > 0. */
object SmokeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"SMOKE entry rows=$n schema=${df.schema.fieldNames.mkString(",")}")
    df.show(5, false)
    spark.stop()
  }
}
