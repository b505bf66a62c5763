package graft.ops

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def chunks(text: String, size: Int, overlap: Int) =
    Chunking.charChunks(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text", size, overlap)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getAs[Long]("chunk_idx"), r.getAs[Long]("chunk_start"),
        r.getAs[Long]("chunk_len"), r.getAs[String]("chunk_text")))

  test("overlapping spans cover the document; last chunk is the remainder") {
    val text = "a" * 950
    val out = chunks(text, size = 400, overlap = 100)
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ===
      Seq((0L, 0L, 400L), (1L, 300L, 400L), (2L, 600L, 350L)))
    assert(out.forall(t => t._4.length == t._3))
    // every character position is inside at least one span
    val covered = out.flatMap(t => t._2 until (t._2 + t._3)).toSet
    assert(covered === (0L until 950L).toSet)
  }

  test("doc shorter than one chunk → single exact chunk; empty doc → one empty chunk") {
    assert(chunks("hello", 400, 100).toSeq === Seq((0L, 0L, 5L, "hello")))
    assert(chunks("", 400, 100).toSeq === Seq((0L, 0L, 0L, "")))
  }

  test("boundary: doc length an exact multiple of the step") {
    val out = chunks("x" * 600, size = 400, overlap = 100) // step 300
    assert(out.map(t => (t._2, t._3)).toSeq === Seq((0L, 400L), (300L, 300L)))
  }

  test("tokenWindows: stride starts, overlap content, full token coverage, empty doc kept") {
    import spark.implicits._
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val words = (0 until 130).map(i => s"w$i")
    val docs = Seq((1L, words.mkString(" ")), (2L, "a b c"), (3L, ""))
      .toDF("doc_id", "text")
    val out = Chunking.tokenWindows(docs, "doc_id", "text", size = 64, stride = 48)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))

    // doc 1 (130 tokens): starts at 0, 48, 96 — last window truncated to 34
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(w => (w._3, w._4)).toSeq === Seq((0L, 64L), (48L, 64L), (96L, 34L)))
    // content witness: each window hashes exactly its token slice,
    // including the 16-token overlaps
    d1.foreach { case (_, _, start, len, h) =>
      assert(h === md5(words.slice(start.toInt, start.toInt + len.toInt).mkString(" ")))
    }
    // short doc: one window with all tokens; empty doc: one empty window
    assert(out.filter(_._1 == 2L).toSeq === Seq((2L, 0L, 0L, 3L, md5("a b c"))))
    assert(out.filter(_._1 == 3L).toSeq === Seq((3L, 0L, 0L, 0L, md5(""))))
  }

  test("property: cdcChunks equals a naive single-threaded chunker on random texts") {
    def md5hex(s: String) = {
      val d = java.security.MessageDigest.getInstance("MD5")
      graft.functions.TextFns.hexBytes(d.digest(s.getBytes("UTF-8")))
    }
    def naive(text: String): Seq[(Long, Long, String)] = {
      val toks = graft.functions.TextFns.tokensScala(text)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
      var cur = List.empty[String]
      toks.foreach { t =>
        cur = t :: cur
        if (md5hex(t).startsWith("0")) {
          out += ((out.length.toLong, cur.length.toLong, cur.reverse.mkString(" ")))
          cur = Nil
        }
      }
      if (cur.nonEmpty)
        out += ((out.length.toLong, cur.length.toLong, cur.reverse.mkString(" ")))
      out.toSeq
    }
    val rnd = new scala.util.Random(31)
    val docs = (0L until 40L).map { i =>
      val n = rnd.nextInt(120)
      (i, (1 to n).map(_ => "t" + rnd.nextInt(300)).mkString(" "))
    }
    val got = Chunking.cdcChunks(docs.toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "chunk_idx", "n_toks", "chunk_text")
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).map { case (k, v) =>
        k -> v.sortBy(_._2).map(r => (r._2, r._3, r._4)).toSeq }
    docs.foreach { case (id, text) =>
      assert(got.getOrElse(id, Seq.empty) === naive(text), s"doc $id")
    }
  }

  test("cdcChunks: boundary law, coverage, shift-robustness; empty doc yields nothing") {
    val words = (1 to 400).map(i => s"w$i")
    val text = words.mkString(" ")
    val base = Chunking.cdcChunks(
        Seq((1L, text), (2L, ""), (3L, null.asInstanceOf[String])).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))
    // empty and NULL docs: no storage units
    assert(base.forall(_._1 == 1L))
    val doc1 = base.sortBy(_._2)
    // chunks cover the token stream exactly, in order
    assert(doc1.map(_._4).mkString(" ") === text)
    assert(doc1.map(_._2).toSeq === doc1.indices.map(_.toLong).toSeq)
    // every non-final chunk ends in a boundary token (md5 leading nibble 0)
    def md5hex(s: String) = {
      val d = java.security.MessageDigest.getInstance("MD5")
      graft.functions.TextFns.hexBytes(d.digest(s.getBytes("UTF-8")))
    }
    doc1.dropRight(1).foreach { case (_, _, _, t, _) =>
      assert(md5hex(t.split(" ").last).startsWith("0"), s"chunk '$t' not boundary-closed")
    }
    // ~400/16 chunks expected; sanity that cutting actually happens
    assert(doc1.length > 10 && doc1.length < 60, s"${doc1.length} chunks")
    // THE CDC property: prepend two tokens — every chunk after the first
    // boundary is byte-identical (fixed-size chunking would shift them all)
    val shifted = Chunking.cdcChunks(
        Seq((1L, "zzz qqq " + text)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getString(4)).toSet
    val common = doc1.map(_._5).toSet.intersect(shifted)
    assert(common.size >= doc1.length - 1,
      s"insertion must only re-chunk the head: ${common.size} of ${doc1.length} survive")
  }
}
