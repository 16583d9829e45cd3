package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Carrier backup/restore — the reference's pre-embed snapshot +
  * rollback (reference: database/pgvector/pg_func.py:441 backup_vectors,
  * attack/clear.py restore loop).
  *
  * The snapshot holds only the carriers' original cells (~rate·N·d
  * rows, the SMALL derived artifact), written as parquet so a restore
  * months later joins it back without recomputing the selection chain.
  * Restore is one broadcast-able left join + coalesce — no driver
  * iteration, unlike the reference's per-row UPDATE loop. */
object Backup {

  /** Snapshot the carriers' pre-embed cells to parquet; returns rows
    * written. */
  def backupCarriers(spark: SparkSession, sfDir: String, path: String): Long = {
    SparkEntry.queries("wm_backup")(spark, sfDir)
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path).count()
  }

  /** Overlay a backup onto any exploded (vec_id, pos, val) table:
    * backed-up cells revert to their original values, everything else
    * passes through. */
  def restore(cells: DataFrame, backupPath: String): DataFrame = {
    val spark = cells.sparkSession
    val bk = spark.read.parquet(backupPath)
      .select(col("vec_id").as("b_id"), col("pos").as("b_pos"),
        col("val").as("b_val"))
    cells.join(bk,
        cells("vec_id") === col("b_id") && cells("pos") === col("b_pos"),
        "left")
      .select(cells("vec_id"), cells("pos"),
        coalesce(col("b_val"), cells("val")).as("val"))
  }
}
