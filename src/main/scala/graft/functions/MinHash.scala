package graft.functions

/** JVM twin of the generated minhash signature chain (sqlgen
  * minhashBandsCtes / minhashSigBuildSql): identical lowercase
  * whitespace word split, consecutive 3-gram shingles joined with a
  * single space, DISTINCT shingles per doc, h = md5-PRF(shingle) mod
  * 2³¹−1 (the same 15 hex digits both SQL dialects parse), 16
  * universal-hash minima (a_r·h + b_r mod p — products < 2⁶², exact
  * in both engines). Integer-exact end to end, so this value is
  * bit-identical to the SQL rendering for any text — which is what
  * lets the STREAMING upsert maintainer (Streams.upsertMinhashStream)
  * keep per-doc signature state that agrees with the oracle-gated
  * batch keys long-for-long (StreamingUpsertMinhashSpec pins it). */
object MinHash {
  val Hashes = 16
  val BandsN = 8 // 8 bands × 2 adjacent hashes — dedup_minhash's geometry
  private val P = WmConst.MinhashP

  /** The 16-hash signature; None for a doc with no 3-gram (fewer than
    * 3 tokens — the SQL chain emits no mh row for such docs). The
    * split keeps EMPTY tokens (limit -1), exactly like the SQL chain:
    * Spark's `split(text, '\\s+')` keeps the leading empty string of
    * whitespace-padded text and (limit -1) the trailing one, and those
    * empties flow into concat_ws shingles — filtering them here would
    * diverge the signature for padded text (r11 ADVICE). */
  def sig(text: String): Option[Seq[Long]] = {
    val toks: Array[String] = text.toLowerCase.split("\\s+", -1)
    if (toks.length < 3) None
    else {
      val hs = toks.sliding(3).map(_.mkString(" ")).toSet
        .toArray.map(sh => Prf.prf(sh) % P)
      Some((0 until Hashes).map { r =>
        val (a, b) = WmConst.minhashCoef(r)
        hs.map(h => (a * h + b) % P).min
      })
    }
  }

  /** The banded blocking keys — (band index, m₂ᵦ·2³¹ + m₂ᵦ₊₁),
    * mirroring the SQL band explode. The bands PARTITION the 16
    * hashes, so the full signature reassembles from its band rows
    * (m₂ᵦ = v div 2³¹, m₂ᵦ₊₁ = v mod 2³¹ — exact, both minima are
    * < 2³¹) — the property the streaming parity spec leans on. */
  def bands(sig: Seq[Long]): Seq[(Int, Long)] =
    (0 until BandsN).map(b => b -> (sig(2 * b) * 2147483648L + sig(2 * b + 1)))
}
