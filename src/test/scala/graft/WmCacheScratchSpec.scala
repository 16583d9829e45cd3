package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-session chain scratch: the first ensure() writes the g_*
  * stages as parquet under a (data, SQL)-fingerprinted key; a second
  * session reuses them (chain build ≈ parquet read) and serves
  * IDENTICAL rows. */
class WmCacheScratchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("second session reuses the parquet scratch and matches") {
    val root = java.nio.file.Files.createTempDirectory("graft_scratch").toString

    val s1 = spark.newSession()
    s1.conf.set("spark.graft.scratch", root)
    WmCache.ensure(s1, TestSpark.Sf)
    val done = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && new java.io.File(f, "_DONE").exists())
    assert(done.length == 1, s"expected one completed scratch key, got ${done.length}")
    val carriers1 = s1.table("g_carriers").collect()
      .map(r => (r.getLong(0), r.getLong(3))).sorted
    assert(carriers1.nonEmpty)
    val stamp = new java.io.File(done(0), "g_stego").lastModified()

    // fresh session: views must come from the scratch parquet, not a
    // rebuild (the stage files are not rewritten)
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.scratch", root)
    WmCache.ensure(s2, TestSpark.Sf)
    val carriers2 = s2.table("g_carriers").collect()
      .map(r => (r.getLong(0), r.getLong(3))).sorted
    assert(carriers2.toSeq == carriers1.toSeq)
    assert(new java.io.File(done(0), "g_stego").lastModified() == stamp,
      "scratch was rebuilt instead of reused")

    // and the scratch-served chain agrees with the oracle-checked
    // inline rendering (scratch off → localCheckpoint path)
    val s3 = spark.newSession()
    s3.conf.set("spark.graft.scratch", "off")
    WmCache.ensure(s3, TestSpark.Sf)
    val carriers3 = s3.table("g_carriers").collect()
      .map(r => (r.getLong(0), r.getLong(3))).sorted
    assert(carriers3.toSeq == carriers1.toSeq)
  }
}
