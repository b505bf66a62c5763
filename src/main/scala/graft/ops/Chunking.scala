package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for training-data pipelines: split long documents into
  * fixed-size spans with overlap (context windows for embedding/training).
  *
  * Law (pure arithmetic — oracle-checkable): spans start every
  * `size - overlap` characters from 0 while `start < max(n - overlap, 1)`
  * — the upper bound excludes a tail span that the previous span already
  * fully covers; each span is `[start, min(start + size, n))`. Every
  * document yields at least one chunk (an empty doc yields one empty
  * chunk, so no document silently disappears from the corpus), and the
  * spans jointly cover every character.
  *
  * Scale shape: `sequence` + `explode` is a narrow, codegen'd fanout — no
  * shuffle, no UDF; the substring extraction is per-row. Fanout =
  * n / (size - overlap) rows per doc, the intended output cardinality.
  */
object Chunking {

  /** Span table: (idCol, chunk_idx, chunk_start, chunk_len[, chunk_text]).
    * Text extraction is optional — at 100 TB the span table alone is often
    * what downstream stages join on.
    */
  def charChunks(df: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int, withText: Boolean = true): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      "need size > 0 and 0 <= overlap < size")
    val step = size - overlap
    // NULL text reads as empty: length(NULL) would null the sequence bound
    // and explode would DROP the document — violating the every-document
    // contract above
    val txt = coalesce(col(textCol), lit(""))
    val n = length(txt)
    // last start = largest step-multiple below max(n - overlap, 1) → 0 for
    // empty/short docs (1 chunk). `div`, not `/`: Column `/` is DOUBLE div
    val lastStart = expr(
      s"((greatest(length(coalesce($textCol, '')) - $overlap, 1L) - 1) div $step) * ${step}L")
    val out = df
      .withColumn("chunk_start", explode(sequence(lit(0L), lastStart, lit(step.toLong))))
      .withColumn("chunk_idx", expr(s"chunk_start div $step"))
      .withColumn("chunk_len",
        least(lit(size.toLong), n.cast("long") - col("chunk_start")))
    val base = out.select(
      (Seq(col(idCol), col("chunk_idx"), col("chunk_start"), col("chunk_len")) ++
        (if (withText)
          // substring is 1-based; empty doc → empty chunk text
          Seq(substring(txt, (col("chunk_start") + 1).cast("int"), lit(size))
            .as("chunk_text"))
        else Nil)): _*)
    base
  }
}
