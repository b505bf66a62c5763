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

  test("oversize registry falls back to total + top-15 slowest + failures at 2 decimals") {
    // a map so large no full-precision tier fits 1950 chars: the fallback
    // must carry the slow tail at REAL precision (the old whole-seconds
    // full map printed most sub-second values as "0" — near-zero review
    // signal), plus every failure, plus the true total and query count
    val big = (0 until 400).map(i => f"k$i%03d" -> 0.25).toMap ++
      Map("slowone" -> 12.34, "slowtwo" -> 3.5, "deadq" -> -1.0)
    val line = Bench.renderLine(big, "sf0.1")
    assert(line.length <= 1950)
    assert(line.contains("\"slowone\":12.34"), s"slowest must render at 2 decimals: $line")
    assert(line.contains("\"slowtwo\":3.5"))
    assert(line.contains("\"deadq\":-1"), "failures must survive the top-15 cut")
    assert(line.contains("\"nq\":403"), "partial map must declare the true query count")
    assert(line.contains("\"nfail\":1"), "failure count must ride along")
    assert(line.contains("\"value\":115.84"), "total stays the FULL sum (400*0.25+12.34+3.5)")
    // 1 failure + the 15 slowest (slowone, slowtwo, 13 quarter-second ks)
    assert("\"k\\d+\":".r.findAllIn(line).size === 13, "only the slow tail is listed")
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
      // the char budget) — unless the registry outgrew every full-map
      // tier, in which case the line must declare itself partial via the
      // true query count
      if (line.contains("\"nq\":"))
        assert(line.contains("\"nq\":" + SparkEntry.queries.size + ","),
          "partial line must carry the live registry size")
      else SparkEntry.queries.keys.foreach { k =>
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

  test("medianOf: lower median, load-robust (one slow pass of three cannot move it)") {
    assert(Bench.medianOf(Seq(5.0)) === 5.0)
    // one 22 s stall among three normal runs — the r16 rationale
    assert(Bench.medianOf(Seq(1.7, 22.0, 1.8)) === 1.8)
    // even count: LOWER median (deterministic, conservative)
    assert(Bench.medianOf(Seq(4.0, 2.0)) === 2.0)
    assert(Bench.medianOf(Seq(3.0, 1.0, 4.0, 2.0)) === 2.0)
    intercept[IllegalArgumentException](Bench.medianOf(Nil))
  }
}
