package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.VectorDot

/** `SparkSessionExtensions` hook: registers the engine's native Catalyst
  * expressions as SQL functions, so `spark.sql` users get the codegen'd
  * kernels too (`SELECT vector_dot(a, b) ...`).
  *
  * Activate per session with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "vector_dot(a, b) takes exactly two arguments")
        VectorDot(children.head, children(1))
      }))
  }
}
