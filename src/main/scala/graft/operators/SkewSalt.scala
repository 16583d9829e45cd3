package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-salted pairwise self-join — the fallback SURVEY §4 promises
  * when one LSH bucket grows pathological (AQE's skew handling covers
  * sort-merge joins, not the all-pairs expansion inside a bucket).
  *
  * Standard replicate-one-side salting: the left row takes ONE
  * deterministic salt in [0, S); the right row is replicated to ALL S
  * salts; joining on (bucket, salt) yields every within-bucket pair
  * exactly once while splitting each bucket's pair generation across S
  * reducers. Cost: right side shuffles S× rows — the classic trade of
  * replication for parallelism; choose S ≈ ceil(maxBucket/targetBucket).
  */
object SkewSalt {

  /** All ordered within-bucket pairs (a_id < b_id) of `df`, salted S
    * ways. Output columns: every input column prefixed a_/b_.
    * Row-set-equivalent to the unsalted self-join. */
  def saltedSelfJoinPairs(df: DataFrame, idCol: String, bucketCol: String,
                          s: Int): DataFrame = {
    // deterministic salt (no rand(): re-runnable)
    val a = df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, s"a_$c"))
      .withColumn("_asalt", pmod(xxhash64(col(s"a_$idCol")), lit(s)))
    val b = df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, s"b_$c"))
      .withColumn("_bsalt", explode(array((0 until s).map(lit(_)): _*)))
    a.join(b,
      col(s"a_$bucketCol") === col(s"b_$bucketCol") &&
        col("_asalt") === col("_bsalt") &&
        col(s"a_$idCol") < col(s"b_$idCol"))
      .drop("_asalt", "_bsalt")
  }
}
