package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, FloatType, LongType}

/** Sign-LSH bucket id for a float embedding: bit p is set when
  * dot(embedding, plane_p) > 0. The plane matrix rides along as a codegen
  * reference object — inlining it as column literals makes the expression
  * tree (planes x dim literals) slow to analyze, compile, and evaluate.
  */
case class FloatVecLshBucket(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression with ExpectsInputTypes {

  require(planes.nonEmpty && planes.size <= 63, "1..63 planes")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType

  private lazy val planeArr: Array[Array[Double]] = planes.map(_.toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val emb = input.asInstanceOf[ArrayData]
    var bucket = 0L
    var p = 0
    while (p < planeArr.length) {
      val plane = planeArr(p)
      val n = math.min(plane.length, emb.numElements())
      var dot = 0.0
      var i = 0
      while (i < n) { dot += emb.getFloat(i).toDouble * plane(i); i += 1 }
      if (dot > 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshPlanes", planeArr, "double[][]")
    nullSafeCodeGen(ctx, ev, emb => {
      val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket"); val plane = ctx.freshName("plane")
      s"""
         |long $bucket = 0L;
         |for (int $p = 0; $p < $ref.length; $p++) {
         |  double[] $plane = $ref[$p];
         |  int $n = java.lang.Math.min($plane.length, $emb.numElements());
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += (double) $emb.getFloat($i) * $plane[$i];
         |  }
         |  if ($dot > 0) $bucket |= 1L << $p;
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): FloatVecLshBucket =
    copy(child = newChild)
}

object FloatVecLshBucket {
  def lshBucket(emb: Column, planes: Seq[Seq[Double]]): Column =
    ExpressionUtils.column(FloatVecLshBucket(ExpressionUtils.expression(emb), planes))
}
