package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScrubSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(s: String): (String, Int, Int) = {
    val r = Seq(s).toDF("t")
      .select(Scrub.maskPii($"t"), Scrub.emailCount($"t"), Scrub.phoneCount($"t"))
      .head()
    (r.getString(0), r.getInt(1), r.getInt(2))
  }

  test("emails and phones are masked; counts match") {
    val (m, e, p) = scrub("mail a.b+c@site-x.co.uk or call 415-555-0142 today")
    assert(m === "mail [EMAIL] or call [PHONE] today")
    assert(e === 1 && p === 1)
  }

  test("multiple occurrences all masked") {
    val (m, e, p) = scrub("x@y.io, z@w.org; 123-456-7890 222.333.4444")
    assert(m === "[EMAIL], [EMAIL]; [PHONE] [PHONE]")
    assert(e === 2 && p === 2)
  }

  test("word boundaries: digit runs embedded in longer numbers stay") {
    // 13 digits around the dashes — \b rejects both ends
    val (m, _, p) = scrub("serial x1234-456-78901 is not a phone")
    assert(m.contains("x1234-456-78901"))
    assert(p === 0)
  }

  test("clean text passes through untouched") {
    val (m, e, p) = scrub("no pii here at all")
    assert(m === "no pii here at all")
    assert(e === 0 && p === 0)
  }

  test("mask tokens are fixpoints: scrubbing twice changes nothing") {
    val once = scrub("a@b.co 555-123-4567")._1
    assert(scrub(once)._1 === once)
  }

  test("piiDensity: exact per-stratum counts and the two compliance rates") {
    import spark.implicits._
    val docs = Seq(
      ("a", "mail me at x@y.com and also z@w.org"), // 2 emails
      ("a", "call 555-123-4567"),                   // 1 phone
      ("a", "clean text"),
      ("b", "all clean here"),
      (null.asInstanceOf[String], "dropped x@y.com"))
      .toDF("src", "text")
    val got = Scrub.piiDensity(docs, "src", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    assert(got("a") === ((3L, 2L, 2L, 1L, 2.0 / 3.0, 3000.0 / 3.0)))
    assert(got("b") === ((1L, 0L, 0L, 0L, 0.0, 0.0)))
    assert(!got.contains(null))
  }

  test("piiDensity: masked residue reports zero exposure") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dirty = Seq(("s", "contact a@b.co or 555-123-4567 today")).toDF("src", "text")
    val masked = dirty.withColumn("text", Scrub.maskPii(col("text")))
    val got = Scrub.piiDensity(masked, "src", "text").head
    assert((got.getLong(2), got.getLong(3), got.getLong(4)) === ((0L, 0L, 0L)),
      "the audit after maskPii must read clean")
  }
}
