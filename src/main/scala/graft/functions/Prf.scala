package graft.functions

import java.security.MessageDigest

/** JVM replica of the shared SQL PRF (see sqlgen.Prim.prf): md5 of the
  * ':'-joined parts, first 15 lowercase hex digits as a non-negative
  * long. Byte-identical to what `md5(concat_ws(':', ...))` yields in
  * Spark SQL and DuckDB, so plan-build-time constants derived here can
  * be inlined as literals in BOTH dialects without breaking the keyed
  * determinism story. */
object Prf {
  def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  def prf(parts: Any*): Long =
    java.lang.Long.parseLong(md5hex(parts.mkString(":")).take(15), 16)

  def prfMod(m: Int, parts: Any*): Long = prf(parts: _*) % m

  def prfSign(parts: Any*): Double = if (prfMod(2, parts: _*) == 0) 1.0 else -1.0
}

/** Plan-build-time watermark constants, all PRF-derived (key-seeded) and
  * inlined as SQL literals in both dialects. Turning these into
  * literals is what makes embed and LSH bucketing pure map-side
  * arithmetic — no joins against generated dimension tables, full
  * whole-stage codegen at 100 TB. */
object WmConst {
  import graft.sqlgen.Wm.{Blocks, Dim, Key, LshPlanes, LshTables, MsgLen}

  /** Per-key derived tables, memoized: the embed/extract API is
    * parameterized by encryption key (reference: embed_watermark's
    * encryption_key argument, pg_func.py:616), and every keyed constant
    * below is a pure function of that key. */
  final class Keyed(key: String) {
    /** Keyed balanced dim→bit-group assignment: a keyed permutation of
      * dims round-robined into MsgLen groups (mirrors the former dimtab
      * CTE: order by (prf('shuf', key, pos), pos), g = rank % MsgLen). */
    val dimGroup: Array[Int] = {
      val ranked = (1 to Dim).sortBy(p => (Prf.prf("shuf", key, p), p))
      val g = new Array[Int](Dim + 1)
      ranked.zipWithIndex.foreach { case (p, r) => g(p) = r % MsgLen }
      g // 1-based by pos; g(0) unused
    }

    /** Keyed per-dim sign pattern (former dimtab.s). */
    val dimSign: Array[Double] =
      (0 to Dim).map(p => if (p == 0) 0.0 else Prf.prfSign("sgn", key, p)).toArray

    /** Dims per group (2 or 3 for 64/24). */
    val groupCnt: Array[Int] = {
      val c = new Array[Int](MsgLen)
      (1 to Dim).foreach(p => c(dimGroup(p)) += 1)
      c
    }

    /** Positions (1-based) of each group, ascending — fold order for the
      * per-group projections. */
    val groupPos: Array[Array[Int]] =
      (0 until MsgLen).map(g => (1 to Dim).filter(dimGroup(_) == g).toArray).toArray
  }

  private val keyedCache =
    new java.util.concurrent.ConcurrentHashMap[String, Keyed]()
  def keyed(key: String): Keyed =
    keyedCache.computeIfAbsent(key, new Keyed(_))

  /** Default-key instances (the compiled-in demo/bench configuration). */
  private val dflt = keyed(Key)
  def dimGroup: Array[Int] = dflt.dimGroup
  def dimSign: Array[Double] = dflt.dimSign
  def groupCnt: Array[Int] = dflt.groupCnt
  def groupPos: Array[Array[Int]] = dflt.groupPos

  /** LSH hyperplane (t, p): ±1 per dim, a pure PRF function — any
    * plane index is derivable, so the plane COUNT can scale with N
    * (Wm.lshPlanesFor) without changing any already-derived plane
    * (former planes CTE: prfMod(2, 'lsh', t, p, dd)). */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()
  def planesFor(t: Int, p: Int): Array[Double] =
    planeCache.computeIfAbsent((t, p), { case (tt, pp) =>
      Array.tabulate(Dim)(dd0 =>
        if (Prf.prfMod(2, "lsh", tt, pp, dd0 + 1) == 0) 1.0 else -1.0)
    })

  /** The default-config plane matrix. */
  val planes: Array[Array[Array[Double]]] =
    Array.tabulate(LshTables, LshPlanes)(planesFor)

  /** Full 24-bit per-block message: 4 idx bits + CRC-4 + 16 payload bits
    * of the AES-GCM ciphertext (former msg24 CTE). msgBit(blk)(j). */
  def msgBits(cipherB64: String): Array[Array[Int]] =
    Array.tabulate(Blocks, MsgLen) { (blk, j) =>
      if (j < 4) (blk >> (3 - j)) & 1
      else if (j < 8) (Crc4(blk) >> (7 - j)) & 1
      else {
        val c = cipherB64.charAt(blk * 2 + (j - 8) / 8).toInt
        (c >> (7 - ((j - 8) % 8))) & 1
      }
    }

  /** MIPS (inner-product) LSH hyperplane (t, p): ±1 per dim PLUS one
    * extra ±1 for the norm-augmentation coordinate (Bachrach et al.
    * 2014: x̃ = [x, √(M²−‖x‖²)] turns max-inner-product into cosine,
    * after which sign-LSH applies; the query augments with 0, so its
    * bucket drops the extra term). Index Dim (0-based) is the
    * augmentation component. A fresh PRF tag keeps these planes
    * independent of the cosine family. */
  private val mipsPlaneCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()
  def mipsPlanesFor(t: Int, p: Int): Array[Double] =
    mipsPlaneCache.computeIfAbsent((t, p), { case (tt, pp) =>
      Array.tabulate(Dim + 1)(dd0 =>
        if (Prf.prfMod(2, "mips", tt, pp, dd0 + 1) == 0) 1.0 else -1.0)
    })

  /** Cauchy (p-stable, p = 1) projection vector (t, j) for the L1 LSH
    * family (Datar et al. 2004): a_k = tan(π(u_k − ½)) with u_k a PRF
    * uniform in (0, 1). COMPUTED HERE, IN THE JVM, and emitted as
    * plan-time decimal literals in both SQL renderings — tan is a
    * libm call whose last ulp differs across engines, so the only
    * engine-proof rendering is a shared literal (the planesFor
    * convention; decimal-literal parsing is correctly rounded in both
    * engines, so each consumes the identical double). */
  private val cauchyCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()
  def cauchyFor(t: Int, j: Int): Array[Double] =
    cauchyCache.computeIfAbsent((t, j), { case (tt, jj) =>
      Array.tabulate(Dim) { k =>
        val u = (Prf.prfMod(1000003, "l1a", tt, jj, k + 1) + 0.5) / 1000003.0
        math.tan(math.Pi * (u - 0.5))
      }
    })

  /** The L1 hash's uniform shift, in [0, 1) — scaled by the bucket
    * width at the call site and emitted as one literal. */
  def cauchyShiftFor(t: Int, j: Int): Double =
    Prf.prfMod(1000003, "l1b", t, j).toDouble / 1000003.0

  /** Folded LayerNorm→linear constants of the deep decoder witness
    * (the inference-time LN-fold — see Queries.nnDeepChainCtes): for
    * output unit j over tags (W, γ, β), returns (c_k = γ_k·w_jk, Σc,
    * Σβ_k·w_jk). ONE derivation shared by the SQL generator and the
    * mapPartitions build (operators.NnDeep), so the two renderings of
    * the same arithmetic can never drift. */
  def nnDeepFold(tagW: String, tagG: String, tagB: String, j: Int): (Array[Double], Double, Double) = {
    val c = Array.tabulate(Dim)(k0 =>
      (1.0 + nnWeight(tagG, k0 + 1, 0)) * nnWeight(tagW, j, k0 + 1))
    val cSum = (1 to Dim).map(k => c(k - 1)).sum
    val bSum = (1 to Dim).map(k =>
      nnWeight(tagB, k, 0) * nnWeight(tagW, j, k)).sum
    (c, cSum, bSum)
  }

  /** MinHash universal-hash coefficients: mh_r(h) = (a_r*h + b_r) mod
    * 2^31-1, h the 31-bit shingle hash. a odd-ish nonzero. */
  val MinhashP = 2147483647L // 2^31 - 1
  def minhashCoef(r: Int): (Long, Long) =
    (Prf.prf("mha", r) % (MinhashP - 1) + 1, Prf.prf("mhb", r) % MinhashP)

  /** PRF-pinned MLP weights for the NN-decoder inference witness
    * (wm_nn_decode — the deep_learning-branch forward pass with
    * literal weights): every weight is (prf(tag, i, j) % 2001 − 1000)
    * / 4000 ∈ [−0.25, 0.25] — exact integer arithmetic + one IEEE
    * divide, bit-identical in the JVM and both SQL renderings. */
  def nnWeight(tag: String, i: Int, j: Int): Double =
    (Prf.prf(tag, i, j) % 2001 - 1000) / 4000.0

  /** Sign-LSH bucket of a MaxSim token vector: bit k−1 set iff dim k
    * is positive — the stage-1 blocking key of search_maxsim_pruned.
    * Mirrors the SQL rendering bit for bit (sign of identical
    * doubles). */
  def maxsimBucket(v: Array[Double]): Int =
    v.indices.foldLeft(0)((acc, k) => if (v(k) > 0) acc | (1 << k) else acc)

  /** The term's probe set: its own bucket plus the 8 hamming-1
    * neighbors — multi-probe against sign-flip boundary noise. */
  def maxsimProbes(token: String): Seq[Int] = {
    val b = maxsimBucket(maxsimVec(token))
    b +: (0 until graft.sqlgen.Wm.MaxSimDim).map(k => b ^ (1 << k))
  }

  /** MaxSim token pseudo-embedding (hash-embedding baseline for the
    * late-interaction retrieval key): dim k (1-based) =
    * (prf('mv', token, k) % 2001 − 1000) / 1000, then L2-normalized
    * with a left-to-right norm fold. Every op is a single
    * correctly-rounded IEEE step on exact integers (int mod, int
    * subtract, one divide, one sqrt), so this JVM value is
    * bit-identical to both SQL renderings of the same formula — the
    * QUERY-term vectors inline as literals (the planesFor convention)
    * while doc-token vectors render in SQL. */
  def maxsimVec(token: String): Array[Double] = {
    val dim = graft.sqlgen.Wm.MaxSimDim
    val r = Array.tabulate(dim)(k =>
      (Prf.prf("mv", token, k + 1) % 2001 - 1000) / 1000.0)
    var s = 0.0
    var i = 0
    while (i < dim) { s += r(i) * r(i); i += 1 }
    val n = math.sqrt(s)
    if (n > 0) r.map(_ / n) else r
  }
}
