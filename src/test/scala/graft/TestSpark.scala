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
      // the default FileContext-based checkpoint manager (and the 4.1
      // checksum wrapper around it) forks a `readlink`/`chmod` shell
      // subprocess per state-store file rename; under this container a
      // forked process occasionally never reaps and the micro-batch
      // deadlocks in ProcessImpl.waitFor. The FileSystem-based manager
      // renames through java.io.File — no subprocess, same semantics.
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
