package graft.functions

import graft.sqlgen.Wm

/** JVM-side blind per-vector decode — the same math as the SQL extract
  * chain (renormalize by current norm, project on the keyed literal
  * sign groups, parity-decode, CRC-gate), shared by the streaming
  * extractor. Fold order matches the SQL masked sums (ascending pos),
  * so both paths agree bit-for-bit. */
object WmDecode {

  /** vals = the vector in pos order (1-based pos → index 0-based).
    * Returns Some(blockIdx, 16 payload bits) iff the CRC header
    * validates. Parameterized by (key, delta) like the SQL extract
    * (defaults reproduce the compiled-in configuration). */
  def decode(vals: Array[Double], key: String = Wm.Key,
             delta: Double = Wm.Delta.toDouble): Option[(Int, Array[Int])] = {
    require(vals.length == Wm.Dim, s"expected ${Wm.Dim} dims")
    val kc = WmConst.keyed(key)
    var ss = 0.0
    var i = 0
    while (i < vals.length) { ss += vals(i) * vals(i); i += 1 }
    val nr = math.sqrt(ss)
    val bits = new Array[Int](Wm.MsgLen)
    var g = 0
    while (g < Wm.MsgLen) {
      var q = 0.0
      var p = 1
      while (p <= Wm.Dim) {
        // masked sum: zero weight off-group, sign on-group (same
        // ascending-pos fold as the SQL w_g dot)
        val w = if (kc.dimGroup(p) == g) kc.dimSign(p) else 0.0
        q += vals(p - 1) * w
        p += 1
      }
      val pj = q / nr
      bits(g) = (((math.floor(pj / delta + 0.5).toLong % 2) + 2) % 2).toInt
      g += 1
    }
    val idx = (bits(0) << 3) | (bits(1) << 2) | (bits(2) << 1) | bits(3)
    val crc = (bits(4) << 3) | (bits(5) << 2) | (bits(6) << 1) | bits(7)
    if (crc == Crc4(idx)) Some((idx, bits.slice(8, 24))) else None
  }
}
