package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time one query and optionally print its formatted plan.
  * Usage: runMain graft.QDebug <name> [sfDir] [explain] [dump]
  * `dump` writes the result + this key's oracle SQL to /tmp/qdump so
  * `tools/check_oracle.py <sfDir> /tmp/qdump` gates ONE key locally. */
object QDebug {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    if (name == "__list__") {
      val q = SparkEntry.queries.keySet; val o = SparkEntry.oracleSql.keySet
      println(s"[qdebug] keys=${q.size} oracle=${o.size} qOnly=${(q -- o).toSeq.sorted.mkString(",")} oOnly=${(o -- q).toSeq.sorted.mkString(",")}")
      return
    }
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("explain")) df.explain("formatted")
    var t0 = System.nanoTime()
    println(s"[qdebug] $name count=${df.count()} first=${(System.nanoTime() - t0) / 1e9}s")
    t0 = System.nanoTime()
    println(s"[qdebug] $name count=${df.count()} second=${(System.nanoTime() - t0) / 1e9}s")
    if (args.contains("dump")) {
      val out = "/tmp/qdump"
      df.repartition(1).write.mode("overwrite").parquet(s"$out/$name")
      val esc = SparkEntry.oracleSql(name)
        .replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\t", "\\t")
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$out/oracle_sql.json"),
        s"""{"$name": "$esc"}""".getBytes("UTF-8"))
    }
    spark.stop()
  }
}
