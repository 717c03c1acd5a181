package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (sbt forks one test JVM). */
object TestSpark {
  lazy val spark: SparkSession =
    GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
  val sf: String = "/root/testdata/sf0.001"
}
