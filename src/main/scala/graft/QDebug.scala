package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time one query and optionally print its formatted plan.
  * Usage: runMain graft.QDebug <name> [sfDir] [explain] */
object QDebug {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("explain")) df.explain("formatted")
    var t0 = System.nanoTime()
    println(s"[qdebug] $name count=${df.count()} first=${(System.nanoTime() - t0) / 1e9}s")
    t0 = System.nanoTime()
    println(s"[qdebug] $name count=${df.count()} second=${(System.nanoTime() - t0) / 1e9}s")
    spark.stop()
  }
}
