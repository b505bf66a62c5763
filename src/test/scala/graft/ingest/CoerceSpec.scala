package graft.ingest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The P2 string→long law in isolation — every shape `Long.parseLong` on a
  * space-trimmed string accepts or rejects (SQLiteDirectImporter.java:522-531).
  * The trailing-newline shapes exist because Java-regex `$` matches BEFORE a
  * final newline: an earlier `^…$` anchor parsed "123\n" to 123 where
  * parseLong (and the RE2 oracle) yield null. `\A…\z` closes that.
  */
class CoerceSpec extends SparkSpec {
  import spark.implicits._

  private def parse(s: String): Option[Long] = {
    val r = Seq(Option(s)).toDF("raw")
      .select(Coerce.strictLong(col("raw")).as("v")).head
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  test("accepts integral forms parseLong accepts (after space trim)") {
    assert(parse("123") === Some(123L))
    assert(parse("  123 ") === Some(123L))
    assert(parse("+5") === Some(5L))
    assert(parse("-7") === Some(-7L))
    assert(parse("0042") === Some(42L))
    assert(parse(Long.MaxValue.toString) === Some(Long.MaxValue))
  }

  test("rejects what parseLong rejects") {
    assert(parse("") === None)
    assert(parse("12.5") === None)
    assert(parse("x12") === None)
    assert(parse("1 2") === None)
    assert(parse("9223372036854775808") === None) // Long.MaxValue + 1 overflows
    assert(parse(null) === None)
  }

  test("trailing newline is NOT stripped by trim and must null") {
    assert(parse("123\n") === None)
    assert(parse(" 123\n ") === None)
    assert(parse("123\r\n") === None)
    assert(parse("\n123") === None)
  }
}
