package graft.tools

import org.apache.spark.sql.SparkSession

/** BPE merge-loop scale probe (r12 verdict task 6): pins the documented
  * driver-loop bound of [[graft.ops.Vocab.trainBpeMerges]] — the loop's
  * cost is a function of the CONFIGURATION (numMerges × maxVocabRows ×
  * word length), never the corpus, and the vocabulary cap is a law, not
  * best-effort.
  *
  * Hard invariants (probe fails loudly on violation):
  *   1. CAP BITE: a pair that dominates the corpus but occurs only in
  *      words OUTSIDE the top `maxVocabRows` rows is never merged; the
  *      same corpus uncapped merges it FIRST.
  *   2. DETERMINISM: two trainings over the same frame produce the
  *      identical ordered merge list.
  *   3. CONFIG-BOUNDED LOOP: doubling the CORPUS (same word-frequency
  *      shape, same cap) changes the merge list not at all — the loop
  *      never sees corpus size, only the collected top rows.
  * Timings print for the linear-in-maxVocabRows eyeball (loop time at
  * 12.5k / 25k / 50k rows), not as assertions (box-load-proof probes
  * assert laws, print clocks).
  *
  * Usage: `runMain graft.tools.BpeScale [numMerges]` (default 100).
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val numMerges = args.lift(0).map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // synthetic Zipf-ish vocabulary: word i appears ~ 60000/(i+1) times,
    // words are 4-9 chars of a 20-letter alphabet, deterministic
    def word(i: Int): String = {
      var h = i * 2654435761L
      val len = 4 + (math.abs(h) % 6).toInt
      (0 until len).map { _ =>
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17
        ('a' + math.abs(h) % 20).toChar
      }.mkString
    }
    def corpus(nWords: Int, repeat: Int) = (0 until nWords).map { i =>
      val f = math.max(1, 600 / (i / 100 + 1)) * repeat
      (i.toLong, (word(i) + " ") * f)
    }.toDF("id", "text")

    // 1. cap bite (the VocabSpec law at probe scale): 60k one-off words
    // carrying 'zq' vs a 1000-word head
    val head = (0 until 1000).map(i => (i.toLong, (word(i) + " ") * 200))
    val tail = (0 until 60000).map(i => (100000L + i, s"zq$i"))
    val planted = (head ++ tail).toDF("id", "text")
    val capped = graft.ops.Vocab.trainBpeMerges(planted, "text",
      numMerges = 20, maxVocabRows = 1000)
    require(!capped.contains(("z", "q")),
      s"CAP VIOLATION: beyond-cap pair merged: $capped")
    val uncapped = graft.ops.Vocab.trainBpeMerges(planted, "text",
      numMerges = 1)
    require(uncapped.head == (("z", "q")),
      s"uncapped first merge should be the dominant (z,q): $uncapped")
    println("=== cap-bite law holds (capped run never merges the beyond-cap pair) ===")

    // 2+3. determinism + corpus-size independence + loop timing per cap
    Seq(12500, 25000, 50000).foreach { cap =>
      val c1 = corpus(cap * 2, 1)
      val t0 = System.nanoTime()
      val m1 = graft.ops.Vocab.trainBpeMerges(c1, "text", numMerges,
        maxVocabRows = cap)
      val dt = (System.nanoTime() - t0) / 1e9
      val m2 = graft.ops.Vocab.trainBpeMerges(c1, "text", numMerges,
        maxVocabRows = cap)
      require(m1 == m2, s"NON-DETERMINISTIC at cap=$cap")
      // doubled corpus, identical word-frequency ORDER (every word 2x):
      // the loop sees only the collected rows, so merges are identical
      val m3 = graft.ops.Vocab.trainBpeMerges(corpus(cap * 2, 2), "text",
        numMerges, maxVocabRows = cap)
      require(m1 == m3,
        s"CORPUS-SIZE LEAK at cap=$cap: 2x corpus changed the merge list")
      println(f"cap=$cap%6d  train($numMerges merges) ${dt}%6.2f s  " +
        f"merges=${m1.size}  deterministic+corpus-independent OK")
    }
    println("=== BpeScale complete: driver loop is config-bounded ===")
    spark.stop()
  }
}
