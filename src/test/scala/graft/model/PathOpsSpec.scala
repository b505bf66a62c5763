package graft.model

import org.scalacheck.Gen

import graft.SparkSpec

class PathOpsSpec extends SparkSpec {
  import spark.implicits._

  private def lvl(s: String): Int =
    Seq(s).toDF("p").select(PathOps.level($"p")).head.getInt(0)
  private def parent(s: String): Option[String] =
    Option(Seq(s).toDF("p").select(PathOps.parentFolder($"p")).head.getString(0))
  private def job(s: String): String =
    Seq(s).toDF("p").select(PathOps.jobName($"p")).head.getString(0)

  // Reference implementations of the Java laws (SQLiteDirectImporter.java:954-982),
  // used as the oracle for property tests.
  private def javaLevel(p: String): Int = {
    if (p == null || p.trim.isEmpty) return 0
    val clean = if (p.startsWith("/")) p.substring(1) else p
    if (clean.isEmpty) 0 else clean.split("/").length
  }
  private def javaParent(p: String): Option[String] = {
    if (p == null || p.trim.isEmpty || javaLevel(p) <= 1) return None
    val i = p.lastIndexOf('/')
    if (i > 0) Some(p.substring(0, i)) else None
  }

  test("level: reference examples") {
    assert(lvl("a.txt") === 1)
    assert(lvl("/a/b") === 2)
    assert(lvl("Root/Sub/a.pdf") === 3)
    assert(lvl("") === 0)
    assert(lvl("  ") === 0)
    assert(lvl("/") === 0)
    assert(lvl("//") === 0)   // java "".split → [], "/"-only strings collapse
    assert(lvl("a//b") === 3) // java keeps middle empties
    assert(lvl("a///") === 1) // java drops trailing empties
    assert(lvl("//a") === 2)  // leading empty kept after one-slash strip
    assert(lvl("/ ") === 1)
  }

  test("parent_folder: reference examples") {
    assert(parent("a.txt") === None)
    assert(parent("/a") === None)           // level 1
    assert(parent("/a/b") === Some("/a"))   // leading slash KEPT
    assert(parent("Root/Sub/a.pdf") === Some("Root/Sub"))
    assert(parent("//a") === Some("/"))     // lastSlash at index 1
    assert(parent("") === None)
    assert(parent("/lead/slash.txt") === Some("/lead"))
  }

  test("job_name: extension strip is case-sensitive; blank → Unknown") {
    assert(job("JobA.xlsx") === "JobA")
    assert(job("JobA.xls") === "JobA")
    assert(job("JobA.XLSX") === "JobA.XLSX") // uppercase survives, as in the reference
    assert(job("  spaced .xlsx") === "spaced") // trim after strip
    assert(job("") === "Unknown")
    assert(job("   ") === "Unknown")
    assert(job("no_ext") === "no_ext")
    assert(job("a.xlsx.xlsx") === "a.xlsx") // only the last extension strips
  }

  test("sanitizeViewName: reference law incl. empty-result and unknown cases") {
    assert(PathOps.sanitizeViewName("match-exists") === "match_exists")
    assert(PathOps.sanitizeViewName("match exists") === "match_exists") // collision with above
    assert(PathOps.sanitizeViewName("Weird Status!") === "weird_status")
    assert(PathOpsSanitizerEdge.allSpecials === "") // "!!!" → "" (skipped by caller)
    assert(PathOps.sanitizeViewName(null) === "unknown")
    assert(PathOps.sanitizeViewName("  ") === "unknown")
    assert(PathOps.sanitizeViewName("__a__b__") === "a_b")
  }

  private val pathGen: Gen[String] = {
    val seg = Gen.oneOf("a", "b", "dir", "file.txt", " ", "", "x y")
    for {
      lead <- Gen.oneOf("", "/", "//")
      n <- Gen.choose(0, 4)
      segs <- Gen.listOfN(n, seg)
      trail <- Gen.oneOf("", "/", "//")
    } yield lead + segs.mkString("/") + trail
  }

  test("property: level and parent_folder match the Java reference law") {
    val cases = Gen.listOfN(300, pathGen).sample.get.distinct
    val df = cases.toDF("p")
      .select($"p", PathOps.level($"p").as("l"), PathOps.parentFolder($"p").as("pf"))
    df.collect().foreach { r =>
      val p = r.getString(0)
      assert(r.getInt(1) === javaLevel(p), s"level('$p')")
      assert(Option(r.getString(2)) === javaParent(p), s"parent('$p')")
    }
  }

  test("property: parent chain law for clean segment paths") {
    // for x/y/z-style paths: level(parent(p)) == level(p) - 1
    val seg = Gen.oneOf("aa", "bb", "cc", "dd")
    val clean = for { n <- Gen.choose(2, 5); s <- Gen.listOfN(n, seg) } yield s.mkString("/")
    val cases = Gen.listOfN(100, clean).sample.get.distinct
    cases.foreach { p =>
      val pf = javaParent(p).get
      assert(javaLevel(pf) === javaLevel(p) - 1)
      assert(parent(p) === Some(pf))
    }
  }
}

/** Kept out of the test class so the "" expectation reads clearly. */
object PathOpsSanitizerEdge {
  def allSpecials: String = PathOps.sanitizeViewName("!!!")
}
