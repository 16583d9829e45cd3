package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registers the driver-generated parquet tables of one scale-factor
  * directory as temp views. Scans stay lazy; Catalyst pushes filters and
  * prunes columns into the parquet reader (verified via .explain —
  * PushedFilters / ReadSchema).
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // one registration per (session, dir): every query calls register, and
  // re-reading 10 parquet footers per query dominates small benchmarks
  private val lastDir = new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  // corpus size per dir (parquet metadata count — no data scan),
  // memoized: SparkEntry/WmCache derive the LSH plane count from it
  private val vecCount = new java.util.concurrent.ConcurrentHashMap[String, Long]()

  /** Row count of `dir`'s embeddings table (metadata-only, memoized). */
  def vectorCount(spark: SparkSession, dir: String): Long =
    vecCount.computeIfAbsent(dir, _ =>
      load(spark, dir, "embeddings").count())

  def register(spark: SparkSession, dir: String): Unit =
    if (lastDir.put(spark, dir) != dir) {
      // events.ts is parquet TIMESTAMP(NANOS), which the vectorized
      // reader rejects; read it as BIGINT nanos (the SQL layer derives
      // seconds).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // pca_project2d's power-iteration chain is ~56 nested CTEs; the
      // analyzer needs one resolution pass per nesting level, so the
      // default 100-iteration fixed point is too tight for it
      spark.conf.set("spark.sql.analyzer.maxIterations", "400")
      graft.functions.DotProduct.register(spark)
      names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
    }
}
