package graft

/** Last round's per-key bench costs (bench_full.json in the repo root,
  * committed each round). Both gate runners use them to order keys
  * CHEAPEST-FIRST, so a wall-clock kill grades/benches the maximal
  * prefix instead of a random one. Missing file or unknown key → a
  * mid-range default (new keys run in the middle, never first or
  * last). Parsing is a 10-line regex on the known single-line shape —
  * no JSON dependency, and any parse failure degrades to the default
  * order rather than failing the gate.
  */
object GateCosts {
  val DefaultCost = 0.4

  def load(path: String = "bench_full.json"): Map[String, Double] =
    try {
      val txt = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
      val start = txt.indexOf("\"queries\":{")
      if (start < 0) Map.empty
      else {
        val body = txt.substring(start + "\"queries\":{".length,
          txt.indexOf('}', start))
        "\"([^\"]+)\":([0-9.Ee+-]+)".r.findAllMatchIn(body)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    } catch { case _: Exception => Map.empty }

  /** Keys sorted cheapest-first by prior cost (ties/unknowns by name). */
  def cheapestFirst(keys: Iterable[String], costs: Map[String, Double]): Seq[String] =
    keys.toSeq.sortBy(k => (costs.getOrElse(k, DefaultCost), k))
}
