package graft.functions

import graft.SparkSpec

class ExcelSerialSpec extends SparkSpec {
  import spark.implicits._

  private def conv(s: String): Option[String] =
    Option(Seq(s).toDF("v")
      .select(ExcelSerial.excelSerialToTimestamp($"v").cast("string")).head.getString(0))

  test("known serial/date pairs (1900 system, POI getJavaDate law, UTC)") {
    assert(conv("1") === Some("1900-01-01 00:00:00"))
    assert(conv("2") === Some("1900-01-02 00:00:00"))
    assert(conv("59") === Some("1900-02-28 00:00:00"))
    // Excel's fake 1900-02-29 (serial 60) lands on Mar 1, same as POI
    assert(conv("60") === Some("1900-03-01 00:00:00"))
    assert(conv("61") === Some("1900-03-01 00:00:00"))
    assert(conv("62") === Some("1900-03-02 00:00:00"))
    assert(conv("25569") === Some("1970-01-01 00:00:00"))
    assert(conv("45000.5") === Some("2023-03-15 12:00:00"))
    assert(conv("44927") === Some("2023-01-01 00:00:00"))
  }

  test("fractional day → time of day, millis truncated to seconds") {
    assert(conv("45000.25") === Some("2023-03-15 06:00:00"))
    assert(conv("45000.75") === Some("2023-03-15 18:00:00"))
    // 0.00001 day = 0.864 s → 864 ms → truncates to 0 s
    assert(conv("45000.00001") === Some("2023-03-15 00:00:00"))
    // 1 - 1e-9 day rounds up to a full day of millis
    assert(conv("45000.999999999") === Some("2023-03-16 00:00:00"))
  }

  test("null paths: empty, non-numeric, zero, negative") {
    assert(conv("") === None)
    assert(conv("  ") === None)
    assert(conv("notadate") === None)
    assert(conv("0") === None)
    assert(conv("0.0") === None)
    assert(conv("-5") === None)
  }

  test("whitespace trimmed before parse, like Double.parseDouble(trim)") {
    assert(conv(" 25569 ") === Some("1970-01-01 00:00:00"))
  }
}
