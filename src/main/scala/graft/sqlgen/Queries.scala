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
  /** LSH: 2 hash tables × 4 hyperplanes = 16 buckets/table. At 100 TB
    * the plane count grows with log2(N / target bucket size). */
  val LshTables = 2
  val LshPlanes = 4
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

  private val P = "'" + Key + "'" // PRF key literal
  private def bigint(e: String) = s"cast($e as bigint)"
  private val crcLit = Crc4.tableValues.mkString(
    if (d.name == "spark") "array(" else "[", ", ",
    if (d.name == "spark") ")" else "]")

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

  /** Keyed hyperplane LSH buckets: (id, t, b). One shuffle (groupBy id,t).
    * This is the 100 TB candidate-generation path for ALL pairwise vector
    * ops (reference builds a faiss HNSW: database/pgvector/pg_func.py:104).
    */
  private val lshCtes = {
    val sign = s"case when ${prfMod(d)(2, "'lsh'", "t", "p", "dd")} = 0 then cast(1 as double) else cast(-1 as double) end"
    s"""tp as (select t, p from ${rangeTable("tt", "t", 0, LshTables - 1)} cross join ${rangeTable("pp", "p", 0, LshPlanes - 1)}),
       |planes as (select t, p, ${d.arrTransform(d.intSeq("1", Dim.toString), "dd", sign)} as plane from tp),
       |bkt as (select nn.id, pl.t, sum(case when ${d.dot("nn.n", "pl.plane")} > 0 then cast(pow(2, pl.p) as bigint) else 0 end) as b
       |        from nn cross join planes pl group by nn.id, pl.t)""".stripMargin
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

  /** Full 24-bit per-block message: 4 idx bits + CRC-4 + 16 payload. */
  private val msg24Cte =
    s"""msg24 as (
       |  select blk, j, ${bitOf(d)("blk", "j", 4)} as bit from ${rangeTable("b4", "blk", 0, Blocks - 1)} cross join ${rangeTable("j4", "j", 0, 3)}
       |  union all
       |  select blk, j + 4, ${bitOf(d)(d.arrIdx0(crcLit, "blk"), "j", 4)} from ${rangeTable("b5", "blk", 0, Blocks - 1)} cross join ${rangeTable("j5", "j", 0, 3)}
       |  union all
       |  select blk, j + 8, bit from msgbits)""".stripMargin

  /** Keyed balanced dim→message-bit grouping + per-dim signs. A keyed
    * permutation of dims round-robins into MsgLen groups so every bit
    * gets floor/ceil(Dim/MsgLen) carrier dims (a pure-PRF grouping can
    * leave bits with zero dims). */
  private val dimtabCtes =
    s"""dimtab as (select pos, ${prfSign(d)("'sgn'", P, "pos")} as s,
       |                  cast((row_number() over (order by ${prf(d)("'shuf'", P, "pos")}, pos) - 1) % $MsgLen as bigint) as g
       |           from ${rangeTable("dp", "pos", 1, Dim)}),
       |gcnt as (select g, count(*) as cnt from dimtab group by g)""".stripMargin

  /** QIM embed: per (carrier, bit-group) project onto the keyed sign
    * pattern, snap the projection to the nearest lattice point whose
    * parity encodes the message bit, distribute the shift across the
    * group's dims, restore the original norm
    * (reference embed: pg_func.py:332-395 embed_into_db). Map-side only
    * apart from the tiny per-(id,g) aggregation. */
  private val stegoCtes =
    s"""cex as (select c.vec_id as id, c.blk, x.pos, x.val / x.nrm as nval, x.nrm
       |        from carriers c join exn x on x.id = c.vec_id),
       |proj as (select cex.id, cex.blk, dt.g, sum(cex.nval * dt.s) as pj
       |         from cex join dimtab dt on dt.pos = cex.pos group by cex.id, cex.blk, dt.g),
       |shifts as (select p.id, p.g, ((2 * cast(floor((p.pj / $Delta - m.bit) / 2 + 0.5) as bigint) + m.bit) * $Delta - p.pj) as shift
       |           from proj p join msg24 m on m.blk = p.blk and m.j = p.g),
       |stego0 as (select cex.id, cex.pos, cex.nval + sh.shift * dt.s / gc.cnt as pval, cex.nrm
       |           from cex join dimtab dt on dt.pos = cex.pos
       |                    join shifts sh on sh.id = cex.id and sh.g = dt.g
       |                    join gcnt gc on gc.g = dt.g),
       |pnrm as (select id, sqrt(sum(pval * pval)) as pn from stego0 group by id),
       |stego as (select s.id, s.pos, s.pval / p.pn * s.nrm as sval
       |          from stego0 s join pnrm p on p.id = s.id)""".stripMargin

  /** Blind extraction from the stego vectors (src = any (id, pos, sval)
    * table): renormalize by CURRENT norm, re-project, decode bit = parity
    * of nearest lattice point, gate on CRC-4 of the 4 decoded index bits,
    * majority-vote payload bits per block
    * (reference: pg_func.py:400-436 extract_from_db). */
  private def extractCtes(src: String): String =
    s"""snrm as (select id, sqrt(sum(sval * sval)) as nrm2 from $src group by id),
       |sproj as (select s.id, dt.g, sum((s.sval / n2.nrm2) * dt.s) as pj2
       |          from $src s join snrm n2 on n2.id = s.id join dimtab dt on dt.pos = s.pos
       |          group by s.id, dt.g),
       |dbits as (select id, g as j, ((cast(floor(pj2 / $Delta + 0.5) as bigint) % 2) + 2) % 2 as bit from sproj),
       |heads as (select id,
       |            sum(case when j < 4 then bit * cast(pow(2, 3 - j) as bigint) else 0 end) as idx,
       |            sum(case when j >= 4 and j < 8 then bit * cast(pow(2, 7 - j) as bigint) else 0 end) as crc
       |          from dbits group by id),
       |valid as (select id, idx as blk from heads where crc = ${d.arrIdx0(crcLit, "idx")}),
       |votes as (select v.blk, db.j - 8 as bit_idx, sum(2 * db.bit - 1) as vote, count(*) as n
       |          from valid v join dbits db on db.id = v.id and db.j >= 8 group by v.blk, db.j)""".stripMargin

  private def wmChain(upTo: String): String = {
    val parts = Seq(nvCtes, exnCte, lshCtes, knnCtes, carrierCtes,
      msgbitsCte, msg24Cte, dimtabCtes, stegoCtes, extractCtes("stego"))
    val need = upTo match {
      case "lsh"      => parts.take(3)
      case "knn"      => parts.take(4)
      case "carriers" => parts.take(5)
      case "stego"    => parts.take(9)
      case "extract"  => parts
    }
    "with " + need.mkString(",\n")
  }

  /** Watermarked full table, exploded: carriers get stego values, the
    * rest keep originals (reference: pg_func.py update_vectors writes
    * exactly this back to the DB). */
  private val fullCte =
    s"""full_t as (select id, pos, sval as val from stego
       |           union all
       |           select x.id, x.pos, x.val from exn x where not exists (select 1 from carriers c where c.vec_id = x.id))""".stripMargin

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
      val shingle = s"concat_ws(' ', ${d.arrIdx0("ws", "k - 1")}, ${d.arrIdx0("ws", "k")}, ${d.arrIdx0("ws", "k + 1")})"
      s"""with $wordCtes,
         |shing as (select doc_id, ${d.arrTransform(d.intSeq("1", d.arrLen("ws") + " - 2"), "k", shingle)} as shs from w),
         |shx as (select distinct doc_id, sh from ${d.explodeFrom("shing", "shs", "spos", "sh", Seq("doc_id"))} _sx),
         |mh as (select doc_id, r, min(md5(concat_ws(':', r, sh))) as mn
         |       from shx cross join ${rangeTable("rr", "r", 0, 15)} group by doc_id, r),
         |bands as (select doc_id, band, md5(concat(max(case when r % 2 = 0 then mn end), max(case when r % 2 = 1 then mn end))) as sig
         |          from (select doc_id, r, ${d.idiv("r", "2")} as band, mn from mh) _b group by doc_id, band),
         |candp as (select distinct a.doc_id as da, b.doc_id as db
         |          from bands a join bands b on a.band = b.band and a.sig = b.sig and a.doc_id < b.doc_id),
         |inter as (select c.da, c.db, count(*) as i from candp c
         |          join shx s1 on s1.doc_id = c.da join shx s2 on s2.doc_id = c.db and s2.sh = s1.sh
         |          group by c.da, c.db),
         |cnts as (select doc_id, count(*) as nsh from shx group by doc_id)
         |select ${bigint("t.da")} as doc_a, ${bigint("t.db")} as doc_b, round(t.i / (ca.nsh + cb.nsh - t.i), 4) as jaccard
         |from inter t join cnts ca on ca.doc_id = t.da join cnts cb on cb.doc_id = t.db
         |where t.i / (ca.nsh + cb.nsh - t.i) >= 0.1""".stripMargin
    },

    "dedup_simhash" ->
      s"""with $wordCtes,
         |wh as (select doc_id, wd, count(*) as cnt, ${d.hex2int("substr(md5(wd), 1, 8)")} as h from wx group by doc_id, wd),
         |sb as (select doc_id, b, sum(cnt * (2 * ${bitOf(d)("h", "b", 32)} - 1)) as wsum
         |       from wh cross join ${rangeTable("bt", "b", 0, 31)} group by doc_id, b)
         |select ${bigint("doc_id")} as doc_id,
         |  ${bigint(s"sum(case when wsum > 0 then cast(pow(2, 31 - b) as bigint) else 0 end)")} as simhash
         |from sb group by doc_id""".stripMargin,

    "dedup_jaccard" -> {
      val grams = d.arrTransform(d.intSeq("1", "length(lower(text)) - 4"), "k", "substr(lower(text), cast(k as int), 5)")
      s"""with g as (select doc_id, $grams as gr from documents),
         |gx as (select distinct doc_id, gm from ${d.explodeFrom("g", "gr", "gp", "gm", Seq("doc_id"))} _gx),
         |pairsel as (select a.doc_id as da, b.doc_id as db from documents a join documents b on b.doc_id = a.doc_id + 1 where a.doc_id % 20 = 0),
         |inter as (select p.da, p.db, count(*) as i from pairsel p
         |          join gx x1 on x1.doc_id = p.da join gx x2 on x2.doc_id = p.db and x2.gm = x1.gm
         |          group by p.da, p.db),
         |cnts as (select doc_id, count(*) as ng from gx group by doc_id)
         |select ${bigint("p.da")} as doc_a, ${bigint("p.db")} as doc_b,
         |  round(coalesce(t.i, 0) / (ca.ng + cb.ng - coalesce(t.i, 0)), 4) as jaccard
         |from pairsel p left join inter t on t.da = p.da and t.db = p.db
         |  join cnts ca on ca.doc_id = p.da join cnts cb on cb.doc_id = p.db""".stripMargin
    },

    "dedup_embedding" ->
      s"""${wmChain("lsh")},
         |pairs as (select distinct a.id as ida, b.id as idb from bkt a join bkt b on a.t = b.t and a.b = b.b and a.id < b.id)
         |select ${bigint("p.ida")} as id_a, ${bigint("p.idb")} as id_b, round(${d.dot("na.n", "nb.n")}, 6) as cos_sim
         |from pairs p join nn na on na.id = p.ida join nn nb on nb.id = p.idb
         |where round(${d.dot("na.n", "nb.n")}, 6) >= 0.3""".stripMargin,

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

    "vec_project2d" ->
      s"""with $nvCtes,
         |ax as (select ${d.arrTransform(d.intSeq("1", Dim.toString), "dd", s"(2.0 * ${prfMod(d)(2, "'ax0'", "dd")} - 1.0) / sqrt(cast($Dim as double))")} as a0,
         |              ${d.arrTransform(d.intSeq("1", Dim.toString), "dd", s"(2.0 * ${prfMod(d)(2, "'ax1'", "dd")} - 1.0) / sqrt(cast($Dim as double))")} as a1)
         |select ${bigint("nn.id")} as vec_id, ${bigint("nn.label")} as label,
         |  round(${d.dot("nn.n", "ax.a0")}, 5) as x, round(${d.dot("nn.n", "ax.a1")}, 5) as y
         |from nn cross join ax""".stripMargin,

    "pca_covariance" ->
      s"""with $nvCtes, $exnCte,
         |e8 as (select id, pos, val from exn where pos <= 8)
         |select ${bigint("a.pos")} as i, ${bigint("b.pos")} as j,
         |  round(avg(a.val * b.val) - avg(a.val) * avg(b.val), 6) as cov
         |from e8 a join e8 b on a.id = b.id and a.pos <= b.pos
         |group by a.pos, b.pos""".stripMargin,

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
