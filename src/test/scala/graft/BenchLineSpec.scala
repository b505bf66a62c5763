package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver captures ~2000 chars of Bench stdout; this pins — against
  * the LIVE registry, so adding a query re-checks the budget — that the
  * rendered line fits with margin under worst-case value widths, and that
  * it stays locale-independent machine-parseable JSON.
  */
class BenchLineSpec extends AnyFunSuite {

  private def lineFor(v: Double): String =
    Bench.renderLine(SparkEntry.queries.keys.map(_ -> v).toMap, "sf0.1")

  test("bench line fits the driver capture window for every registry size/value regime") {
    // worst sub-second width (0.99), worst common width (9.9), failures (-1)
    for (v <- Seq(0.99, 9.9, -1.0)) {
      val line = lineFor(v)
      assert(line.length <= 1950, s"value $v: ${line.length} chars")
    }
  }

  test("whole-second tier renders integers ending in zero intact") {
    // force the dec=0 fallback tier: a map so large no precision tier fits
    // 1950 chars, so renderLine lands on getOrElse(render(0)). Under the
    // old trailing-zero strip, "%.0f" of 10.0 rendered "10" then collapsed
    // to "1" (100 -> "1", 70 -> "7") — a 10-100x silent timing corruption.
    val big = (0 until 400).map(i => f"k$i%03d" -> 10.0).toMap
    val line = Bench.renderLine(big, "sf0.1")
    assert(line.contains("\"k000\":10,") || line.contains("\"k000\":10}"),
      "10.0 must render as 10 in the integer tier")
    assert(line.contains("\"value\":4000,"), "total 400*10 must render as 4000")
    for ((v, want) <- Seq(100.0 -> "100", 70.0 -> "70", 10.5 -> "11")) {
      val l = Bench.renderLine((0 until 400).map(i => f"k$i%03d" -> v).toMap, "sf0.1")
      assert(l.contains("\"k000\":" + want + ","), s"$v must render as $want, got: ${l.take(60)}")
    }
  }

  test("bench line is parseable JSON with every query present, locale-proof") {
    val default = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY) // 0,43 territory
      val line = lineFor(0.43)
      // JSON separators are commas; a LOCALE comma would sit between digits
      assert(!"""\d,\d""".r.findFirstIn(line).isDefined,
        "locale-formatted decimal leaked")
      // minimal structural parse: every registry key appears as "name":
      // (compact form drops the uniform q_ prefix and the underscores for
      // the char budget)
      SparkEntry.queries.keys.foreach { k =>
        assert(line.contains("\"" + k.stripPrefix("q_").replace("_", "") + "\":"),
          s"$k missing from line")
      }
      // the compaction must stay injective over the LIVE registry — two
      // names collapsing to one key would silently merge their timings
      val compacted = SparkEntry.queries.keys
        .map(_.stripPrefix("q_").replace("_", "")).toSeq
      assert(compacted.distinct.size === compacted.size,
        "compact bench names collided")
      assert(line.startsWith("""{"metric":"total","value":"""))
      assert(line.endsWith(""","sf":"sf0.1"}"""))
    } finally java.util.Locale.setDefault(default)
  }
}
