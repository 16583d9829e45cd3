package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (Spark startup is the
  * dominant test cost). */
object TestSpark {
  val Sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
