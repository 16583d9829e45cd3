package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sqlgen.{Gen, SparkDialect, Wm}

/** The SimHash band ladder's NEXT rung exercised (r9 verdict item 5:
  * `simhashBandsFor` arms 3×20 past ~819k docs — beyond the measured
  * 100× decade, so the rung was live formula but dead code). Two
  * halves: the rung-selection arithmetic pinned at its exact
  * boundaries, and the 3×20 geometry EXECUTED against the shipped
  * 5×12 floor on real corpus data — the pigeonhole containment that
  * makes the ladder a recall-radius trade rather than a semantics
  * change, proved pair-for-pair.
  */
class BandLadderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("rung selection: exact boundaries of the N <= 50·2^(60/b+1)/b constraint") {
    // widest band split whose expected random band collisions
    // b·N²/2^(bits+1) stay ≤ 50·N — the §4 ladder formula
    assert(Wm.simhashBandsFor(1L) == 5)
    assert(Wm.simhashBandsFor(81920L) == 5)       // 50·2^13/5
    assert(Wm.simhashBandsFor(81921L) == 4)
    assert(Wm.simhashBandsFor(500000L) == 4)      // the measured 100× decade
    assert(Wm.simhashBandsFor(819200L) == 4)      // 50·2^16/4
    assert(Wm.simhashBandsFor(819201L) == 3)      // the r10 rung under test
    assert(Wm.simhashBandsFor(2000000L) == 3)
    assert(Wm.simhashBandsFor(34952533L) == 3)    // ⌊50·2^21/3⌋
    assert(Wm.simhashBandsFor(34952534L) == 2)
    // the 2×30 rung's own constraint boundary: 50·2^31/2 ≈ 5.4×10¹⁰
    // docs; past it the ladder has no wider rung, so the formula
    // stays at 2 (bounded candidate work is then a corpus-partition
    // concern, not a band-geometry one)
    assert(Wm.simhashBandsFor(53687091200L) == 2) // 50·2^31/2 exactly
    assert(Wm.simhashBandsFor(53687091201L) == 2) // fallback floor
    // every rung divides the 60-bit signature (Gen's require)
    Seq(5, 4, 3, 2).foreach(b => assert(60 % b == 0))
    // the verify/smoke SFs sit at the static floor, so the dumped
    // oracle SQL is scale-independent (the serving-path wiring claim)
    Tables.register(spark, TestSpark.Sf)
    assert(Wm.simhashBandsFor(Tables.docCount(spark, TestSpark.Sf)) == Wm.SimhashBands)
  }

  test("3×20 rung executes: pairs = 5×12 pairs within the narrowed radius (pigeonhole)") {
    Tables.register(spark, TestSpark.Sf)
    def pairs(bands: Int): Map[(Long, Long), Long] =
      spark.sql(new Gen(SparkDialect, simhashBands = bands).sql("dedup_simhash_pairs"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val p5 = pairs(5)
    val p3 = pairs(3)
    assert(p5.nonEmpty, "floor geometry must find near-dup pairs at this SF")
    // the 3-band verify radius is hamming ≤ 2; every reported pair
    // respects it
    p3.values.foreach(h => assert(h <= 2))
    // pigeonhole EQUALITY: a pair within hamming ≤ 2 differs in at
    // most 2 of the 3 bands, so at least one 20-bit band matches
    // exactly — the 3×20 geometry finds EVERY such pair, and nothing
    // beyond its radius. The 5×12 floor (radius ≤ 4) is a superset
    // that agrees on every shared pair's hamming.
    val p5r2 = p5.filter(_._2 <= 2)
    assert(p3 == p5r2,
      s"3×20 pairs (${p3.size}) must equal the radius-2 subset of 5×12 pairs (${p5r2.size})")
    // the rung drops only what it documents: the [3, 4] hamming shell
    (p5.keySet -- p3.keySet).foreach(k => assert(p5(k) >= 3 && p5(k) <= 4))
  }
}
