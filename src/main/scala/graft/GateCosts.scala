package graft

/** Last round's per-key bench costs (bench_full.json in the repo root,
  * committed each round). Both gate runners use them to order keys
  * CHEAPEST-FIRST, so a wall-clock kill grades/benches the maximal
  * prefix instead of a random one. Missing file or unknown key → a
  * mid-range default (new keys run in the middle, never first or
  * last). Parsing is a small regex on the known single-line shape —
  * no JSON dependency, and any parse failure degrades to the default
  * order rather than failing the gate.
  *
  * PROTOCOL-MIXED-INPUT guard (r8 verdict #6): the driver's bench run
  * overwrites bench_full.json mid-run with coverage-sweep numbers — a
  * single cold run per key whose first-touch outliers (observed:
  * dedup_shingle_curve 23.7 s vs 4.5 s steady-state) would demote a
  * cheap key out of the timeout-safe prefix. The cost of a key is
  * therefore the MIN across every number the file carries for it:
  * the "queries" value and, when present, the per-key "stats"
  * [min, median, reps] triple's min (and legacy "sweeps" pairs).
  */
object GateCosts {
  val DefaultCost = 0.4

  /** Per-key map out of one `"section":{...}` object; values may be
    * scalars or arrays — `pick` reduces an array to the section's
    * cost (the schemas differ: "stats" is [min, median, reps] where
    * reps is a COUNT and must not participate; "sweeps" is a pair of
    * medians). */
  private def sectionCosts(txt: String, section: String)(
      pick: Seq[Double] => Double): Map[String, Double] = {
    val start = txt.indexOf("\"" + section + "\":{")
    if (start < 0) Map.empty
    else {
      val body = txt.substring(start + section.length + 4,
        txt.indexOf('}', start))
      "\"([^\"]+)\":(\\[[^\\]]*\\]|[0-9.Ee+-]+)".r.findAllMatchIn(body).flatMap { m =>
        val nums = "[0-9]+(?:\\.[0-9]+)?(?:[Ee][+-]?[0-9]+)?".r
          .findAllIn(m.group(2)).map(_.toDouble).toSeq
        if (nums.isEmpty) None else Some(m.group(1) -> pick(nums))
      }.toMap
    }
  }

  def load(path: String = "bench_full.json"): Map[String, Double] =
    try {
      val txt = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
      val sections = Seq(
        sectionCosts(txt, "queries")(_.head),
        sectionCosts(txt, "stats")(_.head), // [min, median, reps]
        sectionCosts(txt, "sweeps")(_.min)) // legacy pair of medians
      sections.flatMap(_.keys).distinct.map { k =>
        k -> sections.flatMap(_.get(k)).min
      }.toMap
    } catch { case _: Exception => Map.empty }

  /** Keys sorted cheapest-first by prior cost (ties/unknowns by name). */
  def cheapestFirst(keys: Iterable[String], costs: Map[String, Double]): Seq[String] =
    keys.toSeq.sortBy(k => (costs.getOrElse(k, DefaultCost), k))
}
