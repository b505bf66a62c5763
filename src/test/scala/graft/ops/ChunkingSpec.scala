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
}
