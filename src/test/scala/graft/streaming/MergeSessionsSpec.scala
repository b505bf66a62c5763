package graft.streaming

import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the pure sessionizer law behind
  * [[StreamIngest.completedUserSessions]] — no SparkSession needed.
  */
class MergeSessionsSpec extends AnyFunSuite {

  private val GapUs = 30L * 60L * 1000000L

  // reference law: gaps-and-islands over sorted event points (exactly
  // qUserSessionsSql's CASE WHEN gap >= interval THEN break)
  private def referenceSessions(points: Seq[(Long, Double)]): List[(Long, Long, Long, Double)] = {
    val sorted = points.sortBy(_._1)
    if (sorted.isEmpty) Nil
    else sorted.tail.foldLeft(
      List((sorted.head._1, sorted.head._1, 1L, sorted.head._2))) {
      case (h :: t, (u, v)) =>
        if (u - h._2 >= GapUs) (u, u, 1L, v) :: h :: t
        else (h._1, math.max(h._2, u), h._3 + 1, h._4 + v) :: t
      case (Nil, _) => Nil // unreachable: seeded non-empty
    }.reverse
  }

  private def eventsGen: Gen[List[(Long, Double)]] = for {
    n <- Gen.choose(1, 120)
    // cluster starts across ~6 h with sub-gap jitter so both chains and
    // breaks occur
    offs <- Gen.listOfN(n, for {
      base <- Gen.choose(0L, 6L * 3600L * 1000000L)
      jit <- Gen.choose(0L, 2L * GapUs)
    } yield base + jit)
  } yield offs.zipWithIndex.map { case (u, i) => (u, (i % 7).toDouble) }

  private def cases: Seq[List[(Long, Double)]] =
    Gen.listOfN(200, eventsGen).pureApply(Gen.Parameters.default, rng.Seed(42))

  test("merge of singleton intervals equals the gaps-and-islands reference law") {
    cases.foreach { evs =>
      val got = StreamIngest.mergeSessions(evs.map { case (u, v) => (u, u, 1L, v) }, GapUs)
      val want = referenceSessions(evs)
      assert(got.map(s => (s._1, s._2, s._3)) === want.map(s => (s._1, s._2, s._3)))
      // value totals are the same multiset of sums (double addition order may
      // differ, but per-session members are identical, so compare with ulp
      // tolerance)
      got.zip(want).foreach { case (g, w) =>
        assert(math.abs(g._4 - w._4) < 1e-9, s"session total drifted: $g vs $w")
      }
    }
  }

  test("incremental merge over any batch split equals one-shot merge (cross-batch state law)") {
    cases.foreach { evs =>
      val singles = evs.map { case (u, v) => (u, u, 1L, v) }
      val oneShot = StreamIngest.mergeSessions(singles, GapUs)
      val cut = singles.size / 2
      // batches arrive unordered (late data): split by index, not by time
      val (b1, b2) = singles.splitAt(cut)
      val incremental = StreamIngest.mergeSessions(
        StreamIngest.mergeSessions(b1, GapUs) ++ b2, GapUs)
      assert(incremental.map(s => (s._1, s._2, s._3)) ===
        oneShot.map(s => (s._1, s._2, s._3)))
    }
  }

  test("sessions partition the input: counts sum, intervals are gap-separated") {
    cases.foreach { evs =>
      val got = StreamIngest.mergeSessions(evs.map { case (u, v) => (u, u, 1L, v) }, GapUs)
      assert(got.map(_._3).sum === evs.size)
      got.sliding(2).foreach {
        case List(a, b) => assert(b._1 - a._2 >= GapUs,
          s"adjacent sessions closer than the gap: $a then $b")
        case _ => ()
      }
      got.foreach { s => assert(s._1 <= s._2) }
    }
  }
}
