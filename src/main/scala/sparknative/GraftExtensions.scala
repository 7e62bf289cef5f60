package org.apache.spark.sql.graftnative

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers graft's native expressions as SQL functions, so
  * `spark.sql("SELECT fvec_dot(a, b) ...")` works alongside the Column API.
  *
  * Use either via `spark.sql.extensions=org.apache.spark.sql.graftnative.
  * GraftExtensions` at session build, or `GraftExtensions.register(spark)`
  * on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def literalInt(e: Expression, what: String): Int = e.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("fvec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "fvec_dot"),
      (children: Seq[Expression]) => FloatVecDot(children(0), children(1))),
    (FunctionIdentifier("fvec_cosine"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "fvec_cosine"),
      (children: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
        val (a, b) = (children(0), children(1))
        Divide(FloatVecDot(a, b),
          Multiply(Sqrt(FloatVecDot(a, a)), Sqrt(FloatVecDot(b, b))))
      }),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[Simhash64].getName, "simhash64"),
      (children: Seq[Expression]) => Simhash64(children(0))),
    (FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (children: Seq[Expression]) => SortedIntersectCount(children(0), children(1))),
    (FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (children: Seq[Expression]) =>
        ShingleHashes(children(0), literalInt(children(1), "shingle width"))),
    (FunctionIdentifier("bvec_dot"),
      new ExpressionInfo(classOf[ByteVecDot].getName, "bvec_dot"),
      (children: Seq[Expression]) => ByteVecDot(children(0), children(1))),
    (FunctionIdentifier("fvec_sqdist"),
      new ExpressionInfo(classOf[FloatVecSqDist].getName, "fvec_sqdist"),
      (children: Seq[Expression]) => FloatVecSqDist(children(0), children(1))),
    (FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (children: Seq[Expression]) => RollingHash(children(0))),
    (FunctionIdentifier("content_chunk_hashes"),
      new ExpressionInfo(classOf[ContentChunkHashes].getName, "content_chunk_hashes"),
      (children: Seq[Expression]) => ContentChunkHashes(children(0),
        literalInt(children(1), "window"), literalInt(children(2), "maskBits"))),
    (FunctionIdentifier("gram_hashes"),
      new ExpressionInfo(classOf[GramHashes].getName, "gram_hashes"),
      (children: Seq[Expression]) =>
        GramHashes(children(0), literalInt(children(1), "window width"))))

  /** Register the functions on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
