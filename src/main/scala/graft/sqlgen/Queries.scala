package graft.sqlgen

import graft.functions.{Crc4, Crypto}

/** The oracle-checked query corpus.
  *
  * Every query is generated from ONE template and rendered for two
  * dialects: Spark SQL (engine under test — goes through Catalyst like
  * any DataFrame program) and DuckDB 1.0 (the driver's correctness
  * oracle). See SURVEY.md §2 for the operator inventory and §3 for the
  * determinism rules that make the two renderings value-identical.
  *
  * Scale notes are attached per query; the global design rule is: one
  * shuffle per logical stage, LSH-bucketed candidate generation for all
  * O(N²) vector work, broadcastable dimension tables, and decimal-exact
  * money aggregation. See SURVEY.md §4.
  */
object Wm {
  /** Embedding dimensionality of the `embeddings` table (all SFs). */
  val Dim = 64
  /** Watermark message layout (reference: configs/config.py — MSG_LEN=24
    * = 4 idx + 4 crc + 16 payload; BLOCK_COUNT=16). */
  val MsgLen = 24
  val Blocks = 16
  /** QIM quantization step in L2-normalized space. The reference uses a
    * trained encoder with delta_scale≈0.01-0.08 (algorithms/deep_learning/
    * watermark.py:get_adaptive_model_params); we use quantization index
    * modulation (Chen & Wornell 2001) which is deterministic, blind, and
    * exactly decodable — 0.15 keeps post-embed cosine ≥ ~0.99. */
  val Delta = "0.15"
  /** HNSW graph out-degree analog (reference: Config.HNSW_M = 16). */
  val K = 16
  /** LSH: 2 hash tables × 6 hyperplanes = 64 buckets/table (sized for
    * the bench corpus: bits ≈ log2(N / target_bucket_size), 2000/32).
    * At 100 TB the plane count grows with that same formula. */
  val LshTables = 2
  val LshPlanes = 6
  /** Default embed rate (reference: Config.DEFAULT_EMBED_RATE = 0.1). */
  val Rate = "0.1"
  val Key = "graft-key-2026"
  val Message = "GRAFT WATERMARK!" // exactly 16 bytes
  /** Deterministic AES-GCM ciphertext, 32 base64 chars; computed once in
    * the JVM and inlined as a literal in BOTH dialects (AES is not
    * SQL-expressible; the oracle checks everything downstream of it). */
  lazy val CipherB64: String = Crypto.encryptToBase64(Message, Key)
}

final class Gen(d: Dialect) {
  import Prim._
  import Wm._
  import graft.functions.WmConst

  private val P = "'" + Key + "'" // PRF key literal
  private def bigint(e: String) = s"cast($e as bigint)"
  private def arrLit[T](vs: Iterable[T]): String = vs.mkString(
    if (d.name == "spark") "array(" else "[", ", ",
    if (d.name == "spark") ")" else "]")
  private val crcLit = arrLit(Crc4.tableValues)
  /** element_at with a 1-BASED literal position (el(a, 3) = a[3]). */
  private def el(arr: String, pos1: Int) = d.arrIdx0(arr, (pos1 - 1).toString)

  // ------------------------------------------------------------------ //
  // Plan-build-time watermark constants (functions.WmConst): the keyed
  // dim→group table, sign pattern, LSH planes, and 24-bit block
  // messages are all PRF-derived and inlined as literals/unrolled
  // arithmetic in BOTH dialects. This is what makes LSH bucketing and
  // embed pure map-side codegen'd arithmetic — no joins against
  // generated dimension tables, no shuffle.
  // ------------------------------------------------------------------ //

  /** A constant double[Dim] weight vector as a typed array literal
    * (constant-folded to a single Literal node — keeps plans and
    * generated code small). */
  private def weightLit(w: Seq[Double]): String =
    d.castDoubleArray(arrLit(w.map(v => if (v == 0.0) "0.0" else v.toString)))

  /** dot against a constant weight vector: one codegen'd loop on Spark,
    * list_reduce on DuckDB — identical ascending-position fold (zero
    * weights contribute exactly 0.0, preserving the sum bit-for-bit). */
  private def wdot(arr: String, w: Seq[Double]): String = d.dot(arr, weightLit(w))


  /** Flat 16×24 message-bit literal: bit(blk, j) = el(msgLit, blk*24+j+1). */
  private lazy val msgLit = arrLit(WmConst.msgBits(CipherB64).flatMap(_.toSeq).toSeq)

  private def rangeTable(alias: String, col: String, from: Int, to: Int): String =
    if (d.name == "spark")
      s"(select explode(sequence($from, $to)) as $col) $alias"
    else
      s"(select unnest(generate_series($from, $to)) as $col) $alias"

  /** events.ts epoch seconds. Spark reads the NANOS column as BIGINT
    * nanos (Tables.register sets nanosAsLong); DuckDB reads TIMESTAMP_NS
    * natively. */
  private def evSec(ts: String): String =
    if (d.name == "spark") s"(($ts) div 1000000000)"
    else s"cast(floor(epoch($ts)) as bigint)"

  /** events.ts truncated to the hour, as epoch seconds. */
  private def evHourEpoch(ts: String): String =
    if (d.name == "spark") s"((($ts) div 3600000000000) * 3600)"
    else s"cast(floor(epoch(date_trunc('hour', $ts))) as bigint)"

  private def splitWs(e: String): String =
    if (d.name == "spark") s"split($e, ${d.reWs})"
    else s"string_split_regex($e, ${d.reWs})"

  private def regexReplaceAll(s: String, re: String, rep: String): String =
    if (d.name == "spark") s"regexp_replace($s, ${d.reLit(re)}, '$rep')"
    else s"regexp_replace($s, ${d.reLit(re)}, '$rep', 'g')"

  // ---------------------------------------------------------------- //
  // Shared CTE fragments
  // ---------------------------------------------------------------- //

  /** Normalized vector table: (id, label, v double[], nrm, n normalized).
    * Scale: narrow projection of the parquet scan; no shuffle. */
  private val nvCtes =
    s"""ev as (select vec_id as id, label, ${d.castDoubleArray("embedding")} as v from embeddings),
       |nv as (select id, label, v, sqrt(${d.dot("v", "v")}) as nrm from ev),
       |nn as (select id, label, nrm, ${d.arrTransform("v", "x", "x / nrm")} as n from nv)""".stripMargin

  /** Exploded (id, nrm, pos 1-based, val). */
  private val exnCte =
    s"exn as (select * from ${d.explodeFrom("nv", "v", "pos", "val", Seq("id", "nrm"))} _x)"

  /** Keyed hyperplane LSH buckets: (id, t, b). Zero shuffles: the ±1
    * planes are plan-time literals (WmConst.planes), so each bucket id
    * is unrolled per-row arithmetic inside whole-stage codegen. This is
    * the 100 TB candidate-generation path for ALL pairwise vector ops
    * (reference builds a faiss HNSW: database/pgvector/pg_func.py:104).
    */
  private val lshCtes = {
    def bExpr(t: Int): String =
      (0 until LshPlanes).map { p =>
        val dotp = wdot("n", WmConst.planes(t)(p).toSeq)
        s"(case when ($dotp) > 0 then ${1 << p} else 0 end)"
      }.mkString("cast(", " + ", " as bigint)")
    "bkt as (" + (0 until LshTables).map(t =>
      s"select id, $t as t, ${bExpr(t)} as b from nn").mkString(" union all ") + ")"
  }

  /** Approximate kNN graph (K=16) + in-degree, the HNSW-graph analog
    * (reference: pg_func.py:104-122 build_hnsw_index/compute_in_degrees).
    * Work = sum of squared bucket sizes, not N². */
  private val knnCtes =
    s"""cand as (select distinct a.id as src, b.id as dst from bkt a join bkt b on a.t = b.t and a.b = b.b and a.id <> b.id),
       |sims as (select c.src, c.dst, round(${d.dot("na.n", "nb.n")}, 6) as sim
       |         from cand c join nn na on na.id = c.src join nn nb on nb.id = c.dst),
       |knn as (select src, dst, sim, rn from (select src, dst, sim, row_number() over (partition by src order by sim desc, dst) as rn from sims) _e where rn <= $K),
       |indeg as (select nn.id as vec_id, coalesce(dc.c, 0) as in_degree
       |          from nn left join (select dst, count(*) as c from knn group by dst) dc on nn.id = dc.dst)""".stripMargin

  /** Carrier selection (reference: pg_func.py:125-213): degree-buffered
    * candidate pool, then key-seeded weighted sampling without replacement
    * (Efraimidis–Spirakis exponential-clock scores -ln(u)/w — the
    * deterministic analog of the reference's per-layer probabilistic
    * selection with probs 0.9/0.7/0.5/0.4/0.3). */
  private val carrierCtes =
    s"""par as (select nvec, target, least(target + cast(floor(target * 0.5) as bigint), nvec) as pool
       |        from (select nvec, greatest(cast(floor(nvec * $Rate) as bigint), $Blocks) as target
       |              from (select count(*) as nvec from nn) _n) _t),
       |cpool as (select vec_id, in_degree from (select vec_id, in_degree, row_number() over (order by in_degree, vec_id) as dr from indeg) _d cross join par where dr <= pool),
       |scored as (select vec_id, in_degree,
       |             (-ln(${prfUniform(d)("'sel'", P, "vec_id")})) /
       |             (case when in_degree = 0 then 0.9 when in_degree = 1 then 0.7 when in_degree = 2 then 0.5 when in_degree = 3 then 0.4 else 0.3 end) as score
       |           from cpool),
       |carriers as (select vec_id, in_degree, sel_rank, cast((sel_rank - 1) % $Blocks as bigint) as blk
       |             from (select vec_id, in_degree, row_number() over (order by score, vec_id) as sel_rank from scored) _s
       |             cross join par where sel_rank <= target)""".stripMargin

  /** Payload bits of the inlined AES-GCM ciphertext: (blk, j 0..15, bit)
    * (reference: pg_func.py:419 partition_message). */
  private val msgbitsCte =
    s"""msgbits as (select blk, j, ${bitOf(d)(s"ascii(substr('$CipherB64', cast(blk * 2 + ${d.idiv("j", "8")} + 1 as int), 1))", "j % 8", 8)} as bit
       |            from ${rangeTable("bb", "blk", 0, Blocks - 1)} cross join ${rangeTable("jj", "j", 0, 15)})""".stripMargin

  /** Per-pos literal lookup tables (dim→group, sign, group size) — the
    * former dimtab, inlined. */
  private lazy val gLit = arrLit((1 to Dim).map(WmConst.dimGroup(_)))
  private lazy val sLit = d.castDoubleArray(
    arrLit((1 to Dim).map(p => WmConst.dimSign(p).toString)))
  private lazy val cntPosLit = arrLit((1 to Dim).map(p =>
    WmConst.groupCnt(WmConst.dimGroup(p))))
  /** group-g projection weights: sign on the group's dims, 0 elsewhere. */
  private def wLitOf(g: Int): String = weightLit((1 to Dim).map(p =>
    if (WmConst.dimGroup(p) == g) WmConst.dimSign(p) else 0.0))

  /** QIM embed (reference embed: pg_func.py:332-395 embed_into_db): per
    * carrier, compute the 24 keyed group projections, snap each to the
    * nearest lattice point whose parity encodes the message bit,
    * distribute the shift across the group's dims, renormalize to the
    * original norm.
    *
    * Formulated as ONE partial-aggregation over the exploded rows (the
    * 24 projections as masked sums) + a broadcast join back — aggregates
    * are optimizer barriers, so every intermediate is computed once (a
    * pure projection pipeline gets exponentially duplicated by
    * projection collapsing). The renormalizer comes analytically from
    * the projections: ||n+δ||² = 1 + Σ_g (2·sh_g·pj_g + sh_g²)/cnt_g —
    * no second aggregation. One small shuffle (carrier rows only). */
  private val stegoCtes = {
    val pSums = (0 until MsgLen).map(g =>
      s"sum(nval * ${d.arrIdx0(wLitOf(g), "pos - 1")}) as p$g").mkString(",\n|           ")
    def shiftExpr(g: Int): String = {
      val bit = d.arrIdx0(msgLit, s"blk * $MsgLen + $g")
      s"((2 * cast(floor((p$g / $Delta - $bit) / 2 + 0.5) as bigint) + $bit) * $Delta - p$g)"
    }
    val pnSq = (0 until MsgLen).map(g =>
      s"(2 * sh$g * p$g + sh$g * sh$g) / ${WmConst.groupCnt(g)}").mkString(" + ")
    s"""cex as (select c.vec_id as id, c.blk, x.pos, x.val / x.nrm as nval, x.nrm
       |        from carriers c join exn x on x.id = c.vec_id),
       |eagg as (select id, blk, max(nrm) as nrm,
       |           $pSums
       |         from cex group by id, blk),
       |esh as (select id, nrm, ${(0 until MsgLen).map(g => s"p$g").mkString(", ")},
       |          ${(0 until MsgLen).map(g => s"${shiftExpr(g)} as sh$g").mkString(",\n|          ")}
       |        from eagg),
       |eshn as (select id, nrm, ${arrLit((0 until MsgLen).map(g => s"sh$g"))} as sharr,
       |           sqrt(1 + $pnSq) as pn
       |         from esh),
       |stego as (select x.id, x.pos,
       |            (x.nval + ${d.arrIdx0(sLit, "x.pos - 1")} * ${d.arrIdx0("e.sharr", d.arrIdx0(gLit, "x.pos - 1"))} / ${d.arrIdx0(cntPosLit, "x.pos - 1")}) / e.pn * x.nrm as sval
       |          from cex x join eshn e on e.id = x.id)""".stripMargin
  }

  /** Blind extraction (src = any exploded (id, pos, sval) table):
    * renormalize by CURRENT norm, re-project against the literal sign
    * pattern, decode bit = parity of nearest lattice point, gate on
    * CRC-4 of the 4 decoded index bits, then majority-vote payload bits
    * per block (reference: pg_func.py:400-436 extract_from_db).
    *
    * One partial-aggregation computes the squared norm and all 24
    * masked projection sums per vector (optimizer barrier — see
    * stegoCtes); everything after is cheap scalar math + the tiny vote
    * aggregation. Two shuffles total. */
  private def extractCtes(src: String): String = {
    val qSums = (0 until MsgLen).map(g =>
      s"sum(sval * ${d.arrIdx0(wLitOf(g), "pos - 1")}) as q$g").mkString(",\n|           ")
    def bitExpr(g: Int) =
      s"((cast(floor(q$g / nr / $Delta + 0.5) as bigint) % 2) + 2) % 2"
    s"""xagg as (select id, sqrt(sum(sval * sval)) as nr,
       |           $qSums
       |         from $src group by id),
       |xb as (select id, ${(0 until MsgLen).map(g => s"${bitExpr(g)} as b$g").mkString(",\n|         ")}
       |       from xagg),
       |xh as (select id, b0 * 8 + b1 * 4 + b2 * 2 + b3 as idx, b4 * 8 + b5 * 4 + b6 * 2 + b7 as crc,
       |         ${arrLit((8 until MsgLen).map(g => s"b$g"))} as pbits
       |       from xb),
       |valid as (select id, idx as blk, pbits from xh where crc = ${d.arrIdx0(crcLit, "idx")}),
       |vx as (select blk, p1 - 1 as bit_idx, b from ${d.explodeFrom("valid", "pbits", "p1", "b", Seq("blk"))} _vx),
       |votes as (select blk, bit_idx, sum(2 * b - 1) as vote, count(*) as n
       |          from vx group by blk, bit_idx)""".stripMargin
  }

  private def wmChain(upTo: String): String = {
    val parts = Seq(nvCtes, exnCte, lshCtes, knnCtes, carrierCtes,
      msgbitsCte, stegoCtes, extractCtes("stego"))
    val need = upTo match {
      case "lsh"      => parts.take(3)
      case "knn"      => parts.take(4)
      case "carriers" => parts.take(5)
      case "stego"    => parts.take(7)
      case "extract"  => parts
    }
    "with " + need.mkString(",\n")
  }

  /** Watermarked full table, exploded: carriers get stego values, the
    * rest keep originals (reference: pg_func.py update_vectors writes
    * exactly this back to the DB). Left join (broadcastable stego side,
    * ~rate·N rows) — NOT an anti-join against `carriers`, which would
    * re-run the whole selection chain a second time. */
  private val fullCte =
    s"""full_t as (select x.id, x.pos, coalesce(s.sval, x.val) as val
       |           from exn x left join stego s on s.id = x.id and s.pos = x.pos)""".stripMargin

  /** SimHash per-bit signed sums as 32 masked aggregation columns
    * (one groupBy pass — no 32x cross-join row expansion). */
  private lazy val simhashSums: String =
    (0 until 32).map(b =>
      s"sum(cnt * (2 * ${bitOf(d)("h", b.toString, 32)} - 1)) as s$b")
      .mkString(",\n|          ")
  private lazy val simhashSigFromSums: String =
    "cast(" + (0 until 32).map(b =>
      s"(case when s$b > 0 then ${1L << (31 - b)} else 0 end)")
      .mkString(" + ") + " as bigint)"

  /** Word-split documents + exploded words (shared by the text suite). */
  private val wordCtes =
    s"""w as (select doc_id, ${splitWs("lower(text)")} as ws from documents),
       |wx as (select * from ${d.explodeFrom("w", "ws", "wpos", "wd", Seq("doc_id"))} _wx)""".stripMargin

  // ---------------------------------------------------------------- //
  // Queries
  // ---------------------------------------------------------------- //

  private val stop = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "dans", "que"),
    "es" -> Seq("el", "los", "y", "es", "en", "un", "una", "de", "con", "por"))
  private def inList(c: String, ws: Seq[String]) =
    s"case when $c in (${ws.map("'" + _ + "'").mkString(", ")}) then 1 else 0 end"

  val sqls: Map[String, String] = Map(
    // ---------------- relational breadth ----------------
    "q1_pricing" ->
      s"""select l_returnflag, l_linestatus,
         |  round(cast(sum(cast(l_quantity as decimal(18,2))) as double), 2) as sum_qty,
         |  round(cast(sum(cast(l_extendedprice as decimal(18,2))) as double), 2) as sum_base,
         |  round(cast(sum(cast(l_extendedprice as decimal(18,4)) * cast(1 - l_discount as decimal(18,4))) as double), 2) as sum_disc,
         |  round(avg(l_quantity), 4) as avg_qty,
         |  ${bigint("count(*)")} as n
         |from lineitem
         |where l_shipdate <= timestamp '1998-09-01 00:00:00'
         |group by l_returnflag, l_linestatus""".stripMargin,

    "q3_revenue" ->
      s"""with r as (
         |  select o.o_orderkey, sum(cast(l.l_extendedprice as decimal(18,4)) * cast(1 - l.l_discount as decimal(18,4))) as rev
         |  from customer c join orders o on c.c_custkey = o.o_custkey
         |                  join lineitem l on l.l_orderkey = o.o_orderkey
         |  where c.c_mktsegment = 'BUILDING'
         |    and o.o_orderdate < timestamp '1998-01-01 00:00:00'
         |    and l.l_shipdate > timestamp '1998-01-01 00:00:00'
         |  group by o.o_orderkey)
         |select ${bigint("o_orderkey")} as o_orderkey, round(cast(rev as double), 2) as revenue, ${bigint("rn")} as rn
         |from (select o_orderkey, rev, row_number() over (order by rev desc, o_orderkey) as rn from r) _t
         |where rn <= 10""".stripMargin,

    "q5_nation_rev" ->
      s"""select n.n_name,
         |  round(cast(sum(cast(l.l_extendedprice as decimal(18,4)) * cast(1 - l.l_discount as decimal(18,4))) as double), 2) as revenue,
         |  ${bigint("count(*)")} as n_items
         |from region r join nation n on n.n_regionkey = r.r_regionkey
         |  join customer c on c.c_nationkey = n.n_nationkey
         |  join orders o on o.o_custkey = c.c_custkey
         |  join lineitem l on l.l_orderkey = o.o_orderkey
         |  join supplier s on s.s_suppkey = l.l_suppkey and s.s_nationkey = c.c_nationkey
         |where o.o_orderdate >= timestamp '1996-01-01 00:00:00'
         |  and o.o_orderdate < timestamp '1998-01-01 00:00:00'
         |group by n.n_name""".stripMargin,

    "q_window_topn" ->
      s"""select n_name, ${bigint("c_custkey")} as c_custkey, round(c_acctbal, 2) as acctbal, ${bigint("rn")} as rn
         |from (select n.n_name, c.c_custkey, c.c_acctbal,
         |        row_number() over (partition by n.n_name order by c.c_acctbal desc, c.c_custkey) as rn
         |      from customer c join nation n on c.c_nationkey = n.n_nationkey) _t
         |where rn <= 3""".stripMargin,

    "events_sessions" ->
      s"""with e as (select user_id, event_id, ${evSec("ts")} as sec, ts from events),
         |m as (select user_id, event_id, sec,
         |        case when lag(sec) over (partition by user_id order by ts, event_id) is null
         |               or sec - lag(sec) over (partition by user_id order by ts, event_id) > 1800
         |             then 1 else 0 end as new_s
         |      from e),
         |s as (select user_id, event_id, sec,
         |        sum(new_s) over (partition by user_id order by sec, event_id rows between unbounded preceding and current row) as sid
         |      from m)
         |select ${bigint("user_id")} as user_id, ${bigint("sid")} as session_id,
         |       ${bigint("count(*)")} as n_events, ${bigint("max(sec) - min(sec)")} as dur_s
         |from s group by user_id, sid""".stripMargin,

    "events_windowed" ->
      s"""select ${evHourEpoch("ts")} as hour_epoch, event_type,
         |  ${bigint("count(*)")} as n,
         |  round(cast(sum(cast(value as decimal(18,4))) as double), 2) as sum_value
         |from events group by ${evHourEpoch("ts")}, event_type""".stripMargin,

    // ---------------- text analysis ----------------
    "text_tokens" ->
      s"""select ${bigint("doc_id")} as doc_id,
         |  ${bigint(d.arrLen(splitWs("text")))} as ws_tokens,
         |  ${bigint(regexpCountBpe)} as bpe_tokens
         |from documents""".stripMargin,

    "text_quality" ->
      s"""with q as (select doc_id, length(text) as n_chars, ${d.arrLen(splitWs("text"))} as n_words,
         |  length(${regexReplaceAll("text", "[^a-zA-Z]", "")}) as n_alpha,
         |  length(${regexReplaceAll("text", "[^0-9]", "")}) as n_digit
         |from documents)
         |select ${bigint("doc_id")} as doc_id, ${bigint("n_chars")} as n_chars, ${bigint("n_words")} as n_words,
         |  round(n_alpha / n_chars, 4) as alpha_ratio,
         |  round(n_digit / n_chars, 4) as digit_ratio,
         |  round((n_chars - n_alpha - n_digit) / n_chars, 4) as other_ratio,
         |  round((case when n_words >= 20 and n_words <= 80 then 1.0 else 0.5 end) * (n_alpha / n_chars), 4) as quality
         |from q""".stripMargin,

    "text_fingerprint" ->
      s"""select ${bigint("doc_id")} as doc_id,
         |  md5(trim(${regexReplaceAll(regexReplaceAll("lower(text)", "[^a-z0-9 ]", ""), " +", " ")})) as fp
         |from documents""".stripMargin,

    "text_langid" ->
      s"""with $wordCtes,
         |hits as (select doc_id,
         |    sum(${inList("wd", stop("en"))}) as en_hits,
         |    sum(${inList("wd", stop("de"))}) as de_hits,
         |    sum(${inList("wd", stop("fr"))}) as fr_hits,
         |    sum(${inList("wd", stop("es"))}) as es_hits
         |  from wx group by doc_id)
         |select ${bigint("doc_id")} as doc_id,
         |  ${bigint("en_hits")} as en_hits, ${bigint("de_hits")} as de_hits,
         |  ${bigint("fr_hits")} as fr_hits, ${bigint("es_hits")} as es_hits,
         |  case when en_hits >= de_hits and en_hits >= fr_hits and en_hits >= es_hits then 'en'
         |       when de_hits >= fr_hits and de_hits >= es_hits then 'de'
         |       when fr_hits >= es_hits then 'fr' else 'es' end as pred_lang
         |from hits""".stripMargin,

    // ---------------- dedup suite ----------------
    "dedup_exact" ->
      s"""select ${bigint("count(*)")} as dup_groups, ${bigint("coalesce(sum(c - 1), 0)")} as extra_docs
         |from (select md5(text) as h, count(*) as c, min(doc_id) as first_doc
         |      from documents group by md5(text) having count(*) > 1) _g""".stripMargin,

    "dedup_minhash" -> {
      // one md5 per distinct shingle, then 16 universal-hash minhashes
      // (a_r*h+b_r mod 2^31-1: products stay < 2^62, exact in both
      // engines). The 16 signature values ride along through the band
      // explode, so candidate similarity (the standard matching-minhash
      // Jaccard estimate) needs NO second pass over the shingle sets —
      // the expensive text scan runs exactly once.
      val p = WmConst.MinhashP
      val mins = (0 until 16).map { r =>
        val (a, b) = WmConst.minhashCoef(r)
        s"min(($a * h + $b) % $p) as m$r"
      }.mkString(",\n|         ")
      val sigs = arrLit((0 until 8).map(k => s"m${2 * k} * 2147483648 + m${2 * k + 1}"))
      val matches = (0 until 16).map(r =>
        s"(case when a.m$r = b.m$r then 1 else 0 end)").mkString(" + ")
      // shingles via lead() over the exploded words: the regex split
      // runs once per doc at the Generate — a transform-lambda over the
      // split array gets the split substituted into EVERY element
      // access by projection collapse (observed 10x slowdown).
      s"""with $wordCtes,
         |sh3 as (select doc_id, wd, lead(wd, 1) over (partition by doc_id order by wpos) as w2,
         |               lead(wd, 2) over (partition by doc_id order by wpos) as w3
         |        from wx),
         |shx as (select distinct doc_id, concat_ws(' ', wd, w2, w3) as sh from sh3 where w3 is not null),
         |sh31 as (select doc_id, ${d.hex2int("substr(md5(sh), 1, 15)")} % $p as h from shx),
         |mh as (select doc_id,
         |         $mins
         |       from sh31 group by doc_id),
         |bands as (select b1 - 1 as band, sig, ${(0 until 16).map(r => s"m$r").mkString(", ")}, doc_id
         |          from ${d.explodeFrom("mh", sigs, "b1", "sig", (0 until 16).map(r => s"m$r") :+ "doc_id")} _bx),
         |candp as (select distinct a.doc_id as da, b.doc_id as db, ($matches) / 16.0 as est
         |          from bands a join bands b on a.band = b.band and a.sig = b.sig and a.doc_id < b.doc_id)
         |select ${bigint("da")} as doc_a, ${bigint("db")} as doc_b, round(cast(est as double), 4) as jaccard_est
         |from candp where est >= 0.1""".stripMargin
    },

    "dedup_simhash" ->
      s"""with $wordCtes,
         |wh as (select doc_id, wd, count(*) as cnt, ${d.hex2int("substr(md5(wd), 1, 8)")} as h from wx group by doc_id, wd),
         |sbw as (select doc_id, ${simhashSums} from wh group by doc_id)
         |select ${bigint("doc_id")} as doc_id, ${simhashSigFromSums} as simhash
         |from sbw""".stripMargin,

    // SimHash near-dup PAIRS: split the 32-bit hash into 4 byte bands —
    // any pair within hamming distance 4 shares at least one exact
    // band (pigeonhole) — band-join candidates, verify with
    // bit_count(xor). Completes the simhash dedup path at join scale.
    // The 32 bit-sums are masked aggregation columns in ONE groupBy
    // (a 32x cross-join row expansion costs more than it saves).
    "dedup_simhash_pairs" ->
      s"""with $wordCtes,
         |wh as (select doc_id, wd, count(*) as cnt, ${d.hex2int("substr(md5(wd), 1, 8)")} as h from wx group by doc_id, wd),
         |sbw as (select doc_id, ${simhashSums} from wh group by doc_id),
         |sh as (select doc_id, ${simhashSigFromSums} as sig from sbw),
         |bands as (select doc_id, sig, bb, (sig ${if (d.name == "spark") "div" else "//"} cast(pow(2, bb * 8) as bigint)) % 256 as bandv
         |          from sh cross join ${rangeTable("b4", "bb", 0, 3)}),
         |cand as (select distinct a.doc_id as da, a.sig as sa, b.doc_id as db, b.sig as sb2
         |         from bands a join bands b on a.bb = b.bb and a.bandv = b.bandv and a.doc_id < b.doc_id)
         |select ${bigint("da")} as doc_a, ${bigint("db")} as doc_b,
         |  ${bigint(s"bit_count(${if (d.name == "spark") "sa ^ sb2" else "xor(sa, sb2)"})")} as hamming
         |from cand
         |where bit_count(${if (d.name == "spark") "sa ^ sb2" else "xor(sa, sb2)"}) <= 4""".stripMargin,

    "dedup_jaccard" -> {
      val grams = d.arrTransform(d.intSeq("1", "length(lt) - 4"), "k", "substr(lt, cast(k as int), 5)")
      // pairs are (20k, 20k+1); each gram row is tagged with its pair id
      // and side, so ONE groupBy (pair, gram) + ONE groupBy pair yields
      // the intersection and both set sizes — a single pass over the
      // grams instead of four CTE re-evaluations (Spark inlines CTEs).
      // The DISTINCT in g0 is an aggregate barrier that materializes
      // lower(text) once.
      s"""with g0 as (select distinct doc_id, lower(text) as lt from documents where doc_id % 20 <= 1),
         |g as (select doc_id, $grams as gr from g0),
         |gp as (select doc_id - (doc_id % 20) as pair, doc_id % 20 as side, gm
         |       from ${d.explodeFrom("g", "gr", "gpos", "gm", Seq("doc_id"))} _gx),
         |ag as (select pair, gm, max(case when side = 0 then 1 else 0 end) as l,
         |              max(case when side = 1 then 1 else 0 end) as r
         |       from gp group by pair, gm),
         |j as (select pair, sum(l * r) as i, sum(l) as na, sum(r) as nb from ag group by pair)
         |select ${bigint("pair")} as doc_a, ${bigint("pair + 1")} as doc_b,
         |  round(i / (na + nb - i), 4) as jaccard
         |from j where na > 0 and nb > 0""".stripMargin
    },

    "dedup_embedding" ->
      s"""${wmChain("lsh")},
         |pairs as (select distinct a.id as ida, b.id as idb from bkt a join bkt b on a.t = b.t and a.b = b.b and a.id < b.id)
         |select ${bigint("p.ida")} as id_a, ${bigint("p.idb")} as id_b, round(${d.dot("na.n", "nb.n")}, 6) as cos_sim
         |from pairs p join nn na on na.id = p.ida join nn nb on nb.id = p.idb
         |where round(${d.dot("na.n", "nb.n")}, 6) >= 0.3""".stripMargin,

    // composite curation pipeline — the realistic 100 TB training-data
    // job: quality gate → language filter → exact-dedup (keep lowest
    // doc_id) → per-source corpus stats. One pass over documents for
    // the row-level signals, one word explode for language, one
    // fingerprint groupBy for dedup.
    "pipeline_curate" ->
      s"""with $wordCtes,
         |hits as (select doc_id,
         |    sum(${inList("wd", stop("en"))}) as en_hits,
         |    sum(${inList("wd", stop("de"))}) as de_hits,
         |    sum(${inList("wd", stop("fr"))}) as fr_hits,
         |    sum(${inList("wd", stop("es"))}) as es_hits,
         |    ${bigint("count(*)")} as n_words
         |  from wx group by doc_id),
         |sig as (select d.doc_id, d.source, d.lang, d.text, h.n_words,
         |    length(${regexReplaceAll("d.text", "[^a-zA-Z]", "")}) / length(d.text) as alpha_ratio,
         |    case when h.en_hits >= h.de_hits and h.en_hits >= h.fr_hits and h.en_hits >= h.es_hits then 'en'
         |         when h.de_hits >= h.fr_hits and h.de_hits >= h.es_hits then 'de'
         |         when h.fr_hits >= h.es_hits then 'fr' else 'es' end as pred_lang
         |  from documents d join hits h on h.doc_id = d.doc_id),
         |keep1 as (select * from sig where lang = 'en' and alpha_ratio >= 0.6 and n_words >= 10),
         |dedup as (select min(doc_id) as keeper from keep1 group by md5(text)),
         |kept as (select k.* from keep1 k join dedup dd on dd.keeper = k.doc_id)
         |select source, ${bigint("count(*)")} as n_docs,
         |  ${bigint("sum(n_words)")} as total_words,
         |  round(avg(alpha_ratio), 4) as avg_alpha,
         |  ${bigint("sum(case when pred_lang = lang then 1 else 0 end)")} as langid_agree
         |from kept group by source""".stripMargin,

    // ---------------- vector / watermark core ----------------
    "vec_stats" ->
      s"""with $nvCtes
         |select ${bigint("count(*)")} as n_vectors, ${bigint(s"max(${d.arrLen("v")})")} as dim,
         |  ${bigint("count(distinct label)")} as n_labels,
         |  round(avg(nrm), 4) as avg_norm, round(min(nrm), 6) as min_norm, round(max(nrm), 6) as max_norm
         |from nv""".stripMargin,

    "vec_normalize" ->
      s"""with $nvCtes, $exnCte
         |select ${bigint("id")} as vec_id, ${bigint("pos")} as pos, round(val / nrm, 6) as nval
         |from exn""".stripMargin,

    "vec_topk" ->
      s"""with $nvCtes,
         |q as (select id as qid, n as qn from nn where id % 100 = 0),
         |p as (select q.qid, nn.id as cid, round(${d.dot("q.qn", "nn.n")}, 6) as sim from q join nn on nn.id <> q.qid)
         |select ${bigint("qid")} as qid, ${bigint("cid")} as neighbor_id, sim, ${bigint("rn")} as rn
         |from (select qid, cid, sim, row_number() over (partition by qid order by sim desc, cid) as rn from p) _t
         |where rn <= 10""".stripMargin,

    "vec_topk_lsh" ->
      s"""${wmChain("lsh")},
         |q as (select id from nn where id % 100 = 0),
         |cnd as (select distinct a.id as qid, b.id as cid from bkt a join bkt b on a.t = b.t and a.b = b.b and a.id <> b.id
         |        where a.id in (select id from q)),
         |p as (select c.qid, c.cid, round(${d.dot("na.n", "nb.n")}, 6) as sim
         |      from cnd c join nn na on na.id = c.qid join nn nb on nb.id = c.cid)
         |select ${bigint("qid")} as qid, ${bigint("cid")} as neighbor_id, sim, ${bigint("rn")} as rn
         |from (select qid, cid, sim, row_number() over (partition by qid order by sim desc, cid) as rn from p) _t
         |where rn <= 10""".stripMargin,

    // IVF-style ANN: coarse cells = per-label centroid vectors (the
    // deterministic stand-in for k-means — same assign/probe dataflow);
    // every vector is assigned to its nearest cell, queries probe the
    // top-2 cells, and exact ranking runs only within the probed cells.
    // The 100 TB shape: one tiny centroid broadcast, one shuffle on
    // cell id, per-cell work only.
    "vec_topk_ivf" ->
      s"""with $nvCtes, $exnCte,
         |cm as (select label, pos, avg(val) as cval from (select x.id, x.pos, x.val, nv.label from exn x join nv on nv.id = x.id) _lx group by label, pos),
         |cent as (select label, ${d.arrAggOrdered("cval", "pos")} as cv from cm group by label),
         |csim as (select nn.id, cent.label, ${d.dot("nn.n", "cent.cv")} / sqrt(${d.dot("cent.cv", "cent.cv")}) as sim
         |         from nn cross join cent),
         |asg as (select id, label from (select id, label, row_number() over (partition by id order by sim desc, label) as rn from csim) _a where rn = 1),
         |qprobe as (select id, label from (select id, label, row_number() over (partition by id order by sim desc, label) as rn from csim where id % 100 = 0) _q where rn <= 2),
         |cnd as (select qp.id as qid, a.id as cid from qprobe qp join asg a on a.label = qp.label and a.id <> qp.id),
         |p as (select c.qid, c.cid, round(${d.dot("na.n", "nb.n")}, 6) as sim
         |      from cnd c join nn na on na.id = c.qid join nn nb on nb.id = c.cid)
         |select ${bigint("qid")} as qid, ${bigint("cid")} as neighbor_id, sim, ${bigint("rn")} as rn
         |from (select qid, cid, sim, row_number() over (partition by qid order by sim desc, cid) as rn from p) _t
         |where rn <= 10""".stripMargin,

    // L2-distance top-k on RAW vectors — the literal pgvector `<->`
    // operator semantic (cosine variants cover `<=>`); same bounded
    // query subset, same rank determinism rules.
    "vec_topk_l2" -> {
      val sqdiff =
        if (d.name == "spark")
          "aggregate(zip_with(q.v, c.v, (x, y) -> (x - y) * (x - y)), cast(0 as double), (s, t) -> s + t)"
        else
          "list_reduce(list_transform(generate_series(1, len(q.v)), i -> ((q.v)[i] - (c.v)[i]) * ((q.v)[i] - (c.v)[i])), (s, t) -> s + t)"
      s"""with ev as (select vec_id as id, ${d.castDoubleArray("embedding")} as v from embeddings),
         |q as (select id, v from ev where id % 100 = 0),
         |p as (select q.id as qid, c.id as cid, round(sqrt($sqdiff), 6) as dist
         |      from q join ev c on c.id <> q.id)
         |select ${bigint("qid")} as qid, ${bigint("cid")} as neighbor_id, dist, ${bigint("rn")} as rn
         |from (select qid, cid, dist, row_number() over (partition by qid order by dist, cid) as rn from p) _t
         |where rn <= 10""".stripMargin
    },

    // semi-structured: extract a field from the JSON props column and
    // aggregate — get_json_object pushdown-friendly scan + one shuffle.
    "events_props" -> {
      val k =
        if (d.name == "spark") "cast(get_json_object(props, '$.k') as bigint)"
        else "cast(json_extract_string(props, '$.k') as bigint)"
      s"""with e as (select event_type, $k as k from events)
         |select event_type, ${bigint("count(*)")} as n,
         |  ${bigint("sum(k)")} as sum_k, round(avg(k), 4) as avg_k,
         |  ${bigint("min(k)")} as min_k, ${bigint("max(k)")} as max_k
         |from e group by event_type""".stripMargin
    },

    // per-label centroid vectors (class means — the building block the
    // mean-replacement attack and IVF coarse quantizers share): one
    // partial-agg shuffle of (label, pos) cells.
    "vec_centroids" ->
      s"""with $nvCtes,
         |lab as (select * from ${d.explodeFrom("nv", "v", "pos", "val", Seq("label"))} _lb)
         |select ${bigint("label")} as label, ${bigint("pos")} as pos,
         |  ${bigint("count(*)")} as n, round(avg(val), 6) as centroid_val
         |from lab group by label, pos""".stripMargin,

    // exact deterministic quantiles by rank selection (no engine
    // percentile interpolation differences): doc length p50/p90/p99.
    "text_length_quantiles" ->
      s"""with r as (select n_chars, row_number() over (order by n_chars, doc_id) as rn,
         |             count(*) over () as cnt
         |           from documents)
         |select ${bigint("sum(case when rn = cast(ceil(cnt * 0.5) as bigint) then n_chars else 0 end)")} as p50,
         |  ${bigint("sum(case when rn = cast(ceil(cnt * 0.9) as bigint) then n_chars else 0 end)")} as p90,
         |  ${bigint("sum(case when rn = cast(ceil(cnt * 0.99) as bigint) then n_chars else 0 end)")} as p99,
         |  ${bigint("min(n_chars)")} as min_len, ${bigint("max(n_chars)")} as max_len
         |from r""".stripMargin,

    "vec_project2d" ->
      s"""with $nvCtes,
         |ax as (select ${d.arrTransform(d.intSeq("1", Dim.toString), "dd", s"(2.0 * ${prfMod(d)(2, "'ax0'", "dd")} - 1.0) / sqrt(cast($Dim as double))")} as a0,
         |              ${d.arrTransform(d.intSeq("1", Dim.toString), "dd", s"(2.0 * ${prfMod(d)(2, "'ax1'", "dd")} - 1.0) / sqrt(cast($Dim as double))")} as a1)
         |select ${bigint("nn.id")} as vec_id, ${bigint("nn.label")} as label,
         |  round(${d.dot("nn.n", "ax.a0")}, 5) as x, round(${d.dot("nn.n", "ax.a1")}, 5) as y
         |from nn cross join ax""".stripMargin,

    "pca_covariance" ->
      // one scan, 36 partially-aggregated groups — no explode, no
      // self-join; the Gram accumulation pattern that scales to d x d
      // on 100 TB (driver-side eigen-decomposition of the d x d result)
      s"""with $nvCtes,
         |ij as (select i, j from ${rangeTable("ii", "i", 1, 8)} cross join ${rangeTable("jj", "j", 1, 8)} where i <= j)
         |select ${bigint("ij.i")} as i, ${bigint("ij.j")} as j,
         |  round(avg(${d.arrIdx0("v", "i - 1")} * ${d.arrIdx0("v", "j - 1")}) - avg(${d.arrIdx0("v", "i - 1")}) * avg(${d.arrIdx0("v", "j - 1")}), 6) as cov
         |from nv cross join ij
         |group by ij.i, ij.j""".stripMargin,

    "wm_knn_edges" ->
      s"""${wmChain("knn")}
         |select ${bigint("src")} as src, ${bigint("dst")} as dst, ${bigint("rn")} as rn, sim from knn""".stripMargin,

    "wm_in_degree" ->
      s"""${wmChain("knn")}
         |select ${bigint("vec_id")} as vec_id, ${bigint("in_degree")} as in_degree from indeg""".stripMargin,

    "wm_carriers" ->
      s"""${wmChain("carriers")}
         |select ${bigint("vec_id")} as vec_id, ${bigint("in_degree")} as in_degree,
         |       ${bigint("sel_rank")} as sel_rank, ${bigint("blk")} as blk from carriers""".stripMargin,

    "wm_msg_bits" ->
      s"""with $msgbitsCte
         |select ${bigint("blk")} as blk, ${bigint("j")} as bit_idx, ${bigint("bit")} as bit from msgbits""".stripMargin,

    "wm_embed" ->
      s"""${wmChain("stego")}
         |select ${bigint("id")} as vec_id, ${bigint("pos")} as pos, round(sval, 6) as stego_val from stego""".stripMargin,

    "wm_extract" ->
      s"""${wmChain("extract")}
         |select ${bigint("blk")} as blk, ${bigint("bit_idx")} as bit_idx,
         |  ${bigint("case when vote > 0 then 1 else 0 end")} as bit, ${bigint("n")} as votes
         |from votes""".stripMargin,

    // ---------------- attacks (reference: attack/*.py) ----------------
    "attack_gaussian" ->
      s"""with $nvCtes, $exnCte
         |select ${bigint("id")} as vec_id, ${bigint("pos")} as pos,
         |  round(val + 0.1 * ${prfGauss(d)("'ga'", "id", "pos")}, 5) as noisy_val
         |from exn where ${prfMod(d)(10, "'gpick'", "id")} < 3""".stripMargin,

    "attack_mean" ->
      s"""with $nvCtes, $exnCte,
         |mu as (select pos, avg(val) as mval from exn group by pos)
         |select ${bigint("x.id")} as vec_id, ${bigint("x.pos")} as pos, round(mu.mval, 6) as new_val
         |from exn x join mu on mu.pos = x.pos
         |where ${prfMod(d)(10, "'mpick'", "x.id")} < 1""".stripMargin,

    "attack_subset" ->
      s"""with $nvCtes
         |select ${bigint("id")} as vec_id from nv where ${prfMod(d)(10, "'keep'", "id")} < 9""".stripMargin,

    "attack_truncate" ->
      s"""with $nvCtes, $exnCte
         |select ${bigint("id")} as vec_id, ${bigint("pos")} as pos,
         |  round(case when pos <= ${Dim * 7 / 10} then val else 0.0 end, 6) as trunc_val
         |from exn""".stripMargin,

    // flagship: recall@10 impact of watermarking (reference visualizes
    // embedding drift; recall-overlap is the retrieval-centric metric).
    "wm_recall_impact" ->
      s"""${wmChain("stego")},
         |$fullCte,
         |fv as (select id, ${d.arrAggOrdered("val", "pos")} as v from full_t group by id),
         |fn as (select id, ${d.arrTransform("v", "x", s"x / sqrt(${d.dot("v", "v")})")} as n from fv),
         |sw as (select q.id as qid, c.id as cid, round(${d.dot("q.n", "c.n")}, 6) as sim
         |       from fn q join fn c on c.id <> q.id where q.id % 100 = 0),
         |so as (select q.id as qid, c.id as cid, round(${d.dot("q.n", "c.n")}, 6) as sim
         |       from nn q join nn c on c.id <> q.id where q.id % 100 = 0),
         |tw as (select qid, cid from (select qid, cid, row_number() over (partition by qid order by sim desc, cid) as rn from sw) _w where rn <= 10),
         |tl as (select qid, cid from (select qid, cid, row_number() over (partition by qid order by sim desc, cid) as rn from so) _o where rn <= 10)
         |select ${bigint("o.qid")} as qid,
         |  ${bigint("sum(case when w.cid is not null then 1 else 0 end)")} as hits,
         |  round(sum(case when w.cid is not null then 1 else 0 end) / cast(10.0 as double), 2) as recall10
         |from tl o left join tw w on w.qid = o.qid and w.cid = o.cid
         |group by o.qid""".stripMargin,

    // robustness: bit error rate of extraction AFTER a gaussian attack on
    // 30% of the stego rows (reference: attack/random_modify.py + the
    // robustness eval in backend/app.py). Per-block errors; a missing
    // block (no surviving CRC-valid carriers) counts all 16 bits wrong.
    "wm_ber" ->
      s"""${wmChain("stego")},
         |atk as (select id, pos,
         |          case when ${prfMod(d)(10, "'bw'", "id")} < 3
         |               then sval + 0.05 * ${prfGauss(d)("'bw2'", "id", "pos")}
         |               else sval end as sval
         |        from stego),
         |${extractCtes("atk")}
         |select ${bigint("m.blk")} as blk, ${bigint("count(*)")} as n_bits,
         |  ${bigint("sum(case when v.vote is null or (case when v.vote > 0 then 1 else 0 end) <> m.bit then 1 else 0 end)")} as errors,
         |  round(sum(case when v.vote is null or (case when v.vote > 0 then 1 else 0 end) <> m.bit then 1 else 0 end) / cast(16.0 as double), 4) as ber
         |from msgbits m left join votes v on v.blk = m.blk and v.bit_idx = m.j
         |group by m.blk""".stripMargin,

    // robustness matrix, continued: BER after subset deletion (10% of
    // rows dropped — surviving carriers still majority-vote correctly)
    "wm_ber_subset" ->
      s"""${wmChain("stego")},
         |atk as (select id, pos, sval from stego where ${prfMod(d)(10, "'bkeep'", "id")} < 9),
         |${extractCtes("atk")}
         |select ${bigint("m.blk")} as blk,
         |  ${bigint("sum(case when v.vote is null or (case when v.vote > 0 then 1 else 0 end) <> m.bit then 1 else 0 end)")} as errors
         |from msgbits m left join votes v on v.blk = m.blk and v.bit_idx = m.j
         |group by m.blk""".stripMargin,

    // ...and after dimension truncation (30% of dims zeroed): the keyed
    // groups lose members and BER degrades — the honest failure mode the
    // reference's robustness eval also shows for aggressive truncation.
    "wm_ber_truncate" ->
      s"""${wmChain("stego")},
         |atk as (select id, pos, case when pos <= ${Dim * 7 / 10} then sval else 0.0 end as sval from stego),
         |${extractCtes("atk")}
         |select ${bigint("m.blk")} as blk,
         |  ${bigint("sum(case when v.vote is null or (case when v.vote > 0 then 1 else 0 end) <> m.bit then 1 else 0 end)")} as errors
         |from msgbits m left join votes v on v.blk = m.blk and v.bit_idx = m.j
         |group by m.blk""".stripMargin,

    // as-of join: each click event ↦ the user's latest purchase at or
    // before it. One shuffle on user_id + an ordered window — the
    // scalable merge-asof shape (no range join blowup).
    "events_asof" -> {
      val w = "partition by user_id order by tns, k, event_id rows between unbounded preceding and current row"
      s"""with e as (select event_id, user_id, ${evSec("ts")} as sec,
         |             ${if (d.name == "spark") "ts" else "epoch_ns(ts)"} as tns,
         |             case when event_type = 'purchase' then 0 else 1 end as k, event_type
         |           from events where event_type in ('click', 'purchase')),
         |w as (select event_id, user_id, sec, event_type,
         |        ${d.lastIgnoreNulls("case when event_type = 'purchase' then event_id end")} over ($w) as pid,
         |        ${d.lastIgnoreNulls("case when event_type = 'purchase' then sec end")} over ($w) as psec
         |      from e)
         |select ${bigint("event_id")} as event_id, ${bigint("user_id")} as user_id, ${bigint("sec")} as click_sec,
         |       ${bigint("pid")} as purchase_id, ${bigint("psec")} as purchase_sec, ${bigint("sec - psec")} as gap_s
         |from w where event_type = 'click' and pid is not null""".stripMargin
    },

    // negative control: run blind extraction against the UNwatermarked
    // table — only ~1/16 of vectors pass the CRC gate by chance and no
    // coherent blocks emerge (the no-false-positive property of the
    // reference's keyed detector).
    "wm_extract_null" ->
      s"""with $nvCtes, $exnCte,
         |orig as (select id, pos, val as sval from exn),
         |${extractCtes("orig")}
         |select ${bigint("(select count(*) from valid)")} as n_crc_pass,
         |  ${bigint("(select count(*) from nv)")} as n_vectors,
         |  ${bigint("(select count(distinct blk) from valid)")} as n_blocks_hit""".stripMargin,

    // the table update_vectors writes back: stego values for carriers,
    // originals elsewhere (reference: pg_func.py:389-395).
    "vec_writeback" ->
      s"""${wmChain("stego")},
         |$fullCte
         |select ${bigint("id")} as vec_id, ${bigint("pos")} as pos, round(val, 6) as val
         |from full_t""".stripMargin,

    "vec_dim" ->
      s"""select 'embeddings' as tbl, ${bigint("(select count(*) from embeddings)")} as n_rows,
         |  ${bigint(s"(select max(${d.arrLen("embedding")}) from embeddings)")} as vec_dim
         |union all
         |select 'documents' as tbl, ${bigint("(select count(*) from documents)")} as n_rows, 0 as vec_dim""".stripMargin
  )

  private def regexpCountBpe: String =
    d.regexpCount("text", "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")

  def sql(name: String): String = sqls(name)
}
