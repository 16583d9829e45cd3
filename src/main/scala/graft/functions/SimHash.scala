package graft.functions

import graft.sqlgen.Wm

/** JVM twin of the generated dedup_simhash signature chain (sqlgen
  * simhashSigCtes — reference capability: the near-dup screens of
  * database/pgvector + the curation pipeline): identical lowercase
  * whitespace word split, per-(doc, word) counts, 60 masked ±1
  * bit-sums over the word's 60-bit md5 PRF (Prf.prf — the same 15 hex
  * digits both SQL dialects parse), MSB-first sign pack. Everything is
  * integer-exact, so this value is bit-identical to the SQL rendering
  * for any text — which is what lets the STREAMING upsert maintainer
  * (streaming.Streams.upsertStream) keep per-doc signature state that
  * agrees with the oracle-gated batch key long-for-long
  * (StreamingUpsertSpec pins it). */
object SimHash {
  val Bits = 60

  /** Split keeps EMPTY tokens (limit -1), exactly like the SQL chain:
    * Spark's `split(text, '\\s+')` keeps the leading/trailing empty
    * strings of whitespace-padded text and the wh word counts include
    * them — filtering here would diverge the signature for padded
    * text (the minhash r11-ADVICE divergence, same root cause). */
  def sig(text: String): Long = {
    val counts = text.toLowerCase.split("\\s+", -1).toSeq
      .groupBy(identity).view.mapValues(_.length.toLong)
    val sums = new Array[Long](Bits)
    counts.foreach { case (wd, cnt) =>
      val h = Prf.prf(wd)
      var b = 0
      while (b < Bits) {
        sums(b) += cnt * (2 * ((h >> (Bits - 1 - b)) & 1L) - 1)
        b += 1
      }
    }
    var s = 0L
    var b = 0
    while (b < Bits) {
      if (sums(b) > 0) s |= 1L << (Bits - 1 - b)
      b += 1
    }
    s
  }

  /** The banded blocking keys of a signature — (band index, band
    * value), mirroring the SQL `(sig div 2^(bb·w)) % 2^w` rows. The
    * bands PARTITION the 60 bits, so the full signature reassembles
    * from its band rows (Σ bandv << (bb·w)) — the property the
    * streaming parity spec leans on. */
  def bands(sig: Long, nBands: Int = Wm.SimhashBands): Seq[(Int, Long)] = {
    val w = Bits / nBands
    (0 until nBands).map(bb => bb -> ((sig >>> (bb * w)) & ((1L << w) - 1)))
  }
}
