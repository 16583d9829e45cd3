package graft
import org.apache.spark.sql.SparkSession
object PlanOne {
  def main(args: Array[String]): Unit = {
    val keys = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (k <- keys) {
      val df = SparkEntry.queries(k)(spark, sfDir)
      val p = df.queryExecution.executedPlan.toString
      val lines = p.linesIterator.toSeq
      def cnt(s: String) = lines.count(_.contains(s))
      println(s"== $k nodes=${lines.size} scans=${cnt("Scan parquet")} window=${cnt("Window")} smj=${cnt("SortMergeJoin")} bhj=${cnt("BroadcastHashJoin")} bnlj=${cnt("BroadcastNestedLoop")} cart=${cnt("CartesianProduct")} exch=${cnt("Exchange")}")
      if (sys.env.contains("PLAN_FULL")) println(p.take(20000))
    }
    spark.stop()
  }
}
