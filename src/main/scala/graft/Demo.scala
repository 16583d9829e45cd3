package graft

import org.apache.spark.sql.SparkSession
import graft.api.Graft

/** Executable documentation: the reference system's user story through
  * the public facade — embed, blind-recover, search, analyze.
  * Usage: runMain graft.Demo [sfDir] */
object Demo {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val g = Graft(spark, dir)
    println("RECOVERED=" + g.recoverMessage())
    println("TOPK_APPROX_ROWS=" + g.topKApprox.count())
    println("BER_BLOCKS=" + g.berUnderAttack.count())
    println("NEAR_DUP_PAIRS=" + g.dedupMinhash.count())

    // dir switch in one session: table registration must follow
    val g2 = Graft(spark, "/root/testdata/sf0.1")
    println("SWITCHED_N_VECTORS=" + g2.vectorStats.collect().head.getLong(0))
    println("BACK_N_DOCS=" + Graft(spark, dir).catalog.collect()
      .find(_.getString(0) == "documents").get.getLong(1))
    spark.stop()
  }
}
