package graft.functions

import org.scalacheck.Gen

import graft.SparkSpec

/** Property tests pitting engine expressions against independently-written
  * Scala implementations of the laws — regression armor for future
  * expression rewrites.
  */
class LawPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Independent POI-law implementation (SQLiteDirectImporter.java:984-1006
    * semantics, written from the law, not from ExcelSerial's expression tree).
    */
  private def referenceSerial(s: String): Option[String] = {
    val d = try s.trim.toDouble catch { case _: Exception => return None }
    if (d <= 0.0 || d.isNaN) return None
    val whole = math.floor(d).toLong
    val dayAdjust = if (whole < 61) 0L else -1L
    val millis = math.floor((d - whole) * 86400000.0 + 0.5).toLong
    val epochSec = (whole + dayAdjust - 25568L) * 86400L + millis / 1000L
    val ldt = java.time.LocalDateTime.ofEpochSecond(epochSec, 0, java.time.ZoneOffset.UTC)
    Some(ldt.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")))
  }

  test("property: excel serial expression matches the independent law on 400 samples") {
    val serials: Seq[String] =
      Gen.listOfN(200, Gen.chooseNum(0.0, 80000.0)).sample.get.map(_.toString) ++
        Gen.listOfN(100, Gen.chooseNum(1L, 70000L)).sample.get.map(_.toString) ++
        Seq("0", "-1", "59", "60", "61", "60.999999", "25569", "", " ", "x",
          "1e3", "0.5", "0.0001") ++
        Gen.listOfN(87, Gen.chooseNum(0.0, 100.0)).sample.get.map(_.toString)
    val got = serials.toDF("v")
      .select($"v", ExcelSerial.excelSerialToTimestamp($"v").cast("string").as("ts"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    serials.foreach { s =>
      val want = referenceSerial(s).map(_ + "") // seconds precision
      val gotTs = got(s).map(_.stripSuffix(".0")) // spark renders ts without frac here
      assert(gotTs === want, s"serial '$s'")
    }
  }

  test("property: tokensScala (object-boundary law) matches the tokens expression") {
    val texts = Gen.listOfN(120, Gen.oneOf(
      "", " ", "a", " a ", "a b", "a  b\tc", "\n x \n", "a b", // NBSP is not \s
      "word " * 10, "  tabs\t\tand  runs  ")).sample.get.distinct
    val exprTokens = texts.toDF("t")
      .select($"t", TextFns.tokens($"t").as("tk"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    texts.foreach { t =>
      assert(TextFns.tokensScala(t).toList === exprTokens(t), s"text '$t'")
    }
  }
}
