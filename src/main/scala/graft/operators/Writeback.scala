package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{SparkEntry, Tables}

/** Distributed analog of the reference's vector UPDATE loop
  * (reference: database/pgvector/pg_func.py:389-395 — per-row UPDATE of
  * embedded vectors): materialize the watermarked table (stego values
  * for carriers, originals elsewhere) and overwrite it as parquet in
  * one columnar write — no driver-side iteration, scales with
  * partitions. */
object Writeback {

  /** The watermarked table as (vec_id, embedding array<double>). */
  def stegoTable(spark: SparkSession, sfDir: String): DataFrame =
    SparkEntry.queries("vec_writeback")(spark, sfDir)
      .groupBy("vec_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("val")))).as("s"))
      .select(col("vec_id"), expr("transform(s, e -> e.val)").as("embedding"))

  /** Write the watermarked table; returns the row count written. */
  def writeStego(spark: SparkSession, sfDir: String, outPath: String): Long = {
    val df = stegoTable(spark, sfDir)
    df.write.mode("overwrite").parquet(outPath)
    spark.read.parquet(outPath).count()
  }

  /** Bucketed variant: hash-bucket and sort by vec_id so every
    * downstream join/agg on vec_id is co-located — no shuffle
    * (SURVEY §4's pre-partitioning story; at 100 TB this is how the
    * stego table joins back against its source for audits). */
  def writeStegoBucketed(spark: SparkSession, sfDir: String,
                         table: String, path: String,
                         buckets: Int = 32): Long = {
    stegoTable(spark, sfDir).write.mode("overwrite")
      .option("path", new java.io.File(path).getAbsolutePath)
      .bucketBy(buckets, "vec_id").sortBy("vec_id")
      .format("parquet").saveAsTable(table)
    spark.table(table).count()
  }
}
