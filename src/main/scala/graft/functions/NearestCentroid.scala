package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructType}

/** Codegen'd nearest-centroid argmax over a quantized integer codebook —
  * the hot kernel of [[graft.ops.Similarity.kmeansRefineSums]]'s assignment
  * step. Arguments:
  *
  *   - `vec`:      `array<bigint>` — the point's micro-quantized components.
  *   - `codebook`: `array<struct<cluster_id: bigint, qc: array<bigint>>>` —
  *     ALL centroids folded into one value (the ≤k-row codebook aggregated
  *     to a single array and broadcast), so the whole argmax is one narrow
  *     per-row projection: no per-centroid join fan-out, no `groupBy`
  *     re-aggregation exchange afterwards.
  *
  * Law (identical to the declarative
  * `max_by(cluster_id, struct(dot, -cluster_id))` form it replaces, pinned
  * by the q_kmeans_refine oracle): the winning centroid maximizes the
  * INTEGER dot product `Σ vec_i · qc_i` over the common prefix length;
  * ties break to the SMALLER cluster id — implemented order-independently
  * (`dot > best || (dot == best && id < bestId)`), so the codebook array
  * order never matters. Entries with a NULL cluster_id or NULL vector are
  * skipped; NULL elements contribute 0 (vectors are dense by
  * construction). Returns NULL when the codebook is empty or holds no
  * valid entry — the no-home verdict, filtered by the caller.
  *
  * Overflow: inputs are unit-normalized before micro-quantization, so
  * |vec_i|, |qc_i| ≤ 1e6 ⇒ each product ≤ 1e12 and the sum stays far
  * inside BIGINT for any realistic dimension count (< 9·10^6 dims).
  *
  * Why an Expression and not the `aggregate(zip_with(...))` chain: those
  * higher-order functions are CodegenFallback — interpreted per element,
  * with one products-array allocation per (row × centroid) — and Catalyst
  * freely duplicates them. This is the same justification, and the same
  * fused-loop shape, as [[CosineSimilarity]].
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    val cbOk = right.dataType match {
      case ArrayType(StructType(fields), _) if fields.length == 2 =>
        fields(0).dataType == LongType &&
          (fields(1).dataType match {
            case ArrayType(LongType, _) => true
            case _ => false
          })
      case _ => false
    }
    if (vecOk && cbOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<bigint>, array<struct<bigint, array<bigint>>>), " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    var bestId = 0L
    var bestDot = 0L
    var found = false
    var c = 0
    while (c < cb.numElements()) {
      if (!cb.isNullAt(c)) {
        val entry = cb.getStruct(c, 2)
        if (!entry.isNullAt(0) && !entry.isNullAt(1)) {
          val id = entry.getLong(0)
          val qc = entry.getArray(1)
          val n = math.min(vec.numElements(), qc.numElements())
          var dot = 0L
          var i = 0
          while (i < n) {
            val xi = if (vec.isNullAt(i)) 0L else vec.getLong(i)
            val yi = if (qc.isNullAt(i)) 0L else qc.getLong(i)
            dot += xi * yi
            i += 1
          }
          if (!found || dot > bestDot || (dot == bestDot && id < bestId)) {
            bestId = id; bestDot = dot; found = true
          }
        }
      }
      c += 1
    }
    if (found) bestId else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val entry = ctx.freshName("entry")
      val qc = ctx.freshName("qc")
      val id = ctx.freshName("id")
      val bestId = ctx.freshName("bestId")
      val bestDot = ctx.freshName("bestDot")
      val found = ctx.freshName("found")
      s"""
         |long $bestId = 0L; long $bestDot = 0L; boolean $found = false;
         |for (int $c = 0; $c < $b.numElements(); $c++) {
         |  if (!$b.isNullAt($c)) {
         |    InternalRow $entry = $b.getStruct($c, 2);
         |    if (!$entry.isNullAt(0) && !$entry.isNullAt(1)) {
         |      long $id = $entry.getLong(0);
         |      org.apache.spark.sql.catalyst.util.ArrayData $qc = $entry.getArray(1);
         |      int $n = java.lang.Math.min($a.numElements(), $qc.numElements());
         |      long $dot = 0L;
         |      for (int $i = 0; $i < $n; $i++) {
         |        long $xi = $a.isNullAt($i) ? 0L : $a.getLong($i);
         |        long $yi = $qc.isNullAt($i) ? 0L : $qc.getLong($i);
         |        $dot += $xi * $yi;
         |      }
         |      if (!$found || $dot > $bestDot || ($dot == $bestDot && $id < $bestId)) {
         |        $bestId = $id; $bestDot = $dot; $found = true;
         |      }
         |    }
         |  }
         |}
         |if ($found) { ${ev.value} = $bestId; } else { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object NearestCentroid {

  /** Column-API form — requires [[register]] on the session first. */
  def nearest(vec: Column, codebook: Column): Column =
    call_function("graft_nearest_centroid", vec, codebook)

  private val info =
    new ExpressionInfo(classOf[NearestCentroid].getName, "graft_nearest_centroid")
  private[functions] val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => NearestCentroid(a, b)
    case args => throw new IllegalArgumentException(
      s"graft_nearest_centroid expects 2 arguments, got ${args.size}")
  }

  /** Register `graft_nearest_centroid` for SQL + Column use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_nearest_centroid"), info, builder)
}
