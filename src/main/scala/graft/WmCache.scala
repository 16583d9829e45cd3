package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sqlgen.{Gen, SparkDialect}

/** Shared materialization of the watermark chain (bkt → knn → indeg →
  * carriers → stego) per (session, sf dir).
  *
  * ~11 queries (wm_*, BER suite, writeback, recall, LSH dedup/top-k)
  * consume some prefix of the same chain; without sharing, each one
  * rebuilds it from scratch (the reference computes it once per embed
  * call too — database/pgvector/pg_func.py:735 embed_watermark). Each
  * stage is materialized eagerly with `localCheckpoint` and registered
  * as a g_* temp view; the Spark-dialect query rendering (Gen with
  * useViews) aliases the views while the DuckDB oracle keeps the full
  * inline chain — the views hold exactly the full chain's rows, so
  * results are identical.
  *
  * localCheckpoint (not persist) on purpose: it SEVERS the logical
  * lineage, so each registered view is a plain LogicalRDD. A lazily
  * persisted view would carry its full WithCTE plan into every
  * consumer; nesting those inside the consumers' own CTEs trips
  * Catalyst's PushdownPredicatesAndPruneColumnsForCTEDef on CTE-id
  * bookkeeping (observed: "key not found" crashes and, worse, a
  * mis-resolved CTE ref that silently built stego rows from the wrong
  * carrier set). Checkpointed views also guarantee each stage computes
  * exactly once.
  *
  * Scale note: at 100 TB the same structure applies with the local
  * checkpoints replaced by reliable checkpoints / scratch tables — the
  * cached stages are the SMALL derived artifacts (O(N) ids/edges and
  * rate·N·d stego cells), never the raw exploded vectors.
  */
object WmCache {

  /** Query keys whose Spark rendering reads the g_* views. */
  val dependents: Set[String] = Set(
    "dedup_embedding", "vec_topk_lsh", "wm_knn_edges", "wm_in_degree",
    "wm_carriers", "wm_embed", "wm_extract", "wm_ber", "wm_ber_subset",
    "wm_ber_truncate", "wm_recall_impact", "vec_writeback", "wm_drift",
    "wm_backup", "wm_restore")

  private case class Entry(dir: String, dfs: Seq[DataFrame])
  private val state = new java.util.concurrent.ConcurrentHashMap[SparkSession, Entry]()

  /** Idempotently build + register the chain views for (spark, dir). */
  def ensure(spark: SparkSession, dir: String): Unit = state.synchronized {
    val cur = state.get(spark)
    if (cur == null || cur.dir != dir) {
      if (cur != null) cur.dfs.foreach(_.unpersist(blocking = false))
      Tables.register(spark, dir)
      val gen = new Gen(SparkDialect)
      val dfs = gen.cacheStages.map { case (view, sql) =>
        // eager: computes the stage NOW (against the views registered so
        // far) and registers a lineage-free LogicalRDD view
        val df = spark.sql(sql).localCheckpoint()
        df.createOrReplaceTempView(view)
        df
      }
      state.put(spark, Entry(dir, dfs))
    }
  }
}
