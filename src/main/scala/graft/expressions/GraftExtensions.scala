package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension wiring for the engine's native expressions — install
  * with `SparkSession.builder().withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.expressions.GraftExtensions`) and
  * `dot_double` / `sorted_int_intersect_size` resolve in SQL and
  * `expr(...)` everywhere, no per-session registration calls. The
  * per-session `register(spark)` helpers remain for driver-created
  * sessions the library doesn't build (Verify/Bench contract mains).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_double"),
      new ExpressionInfo(classOf[DotProductDouble].getName, "dot_double"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProductDouble(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("sorted_int_intersect_size"),
      new ExpressionInfo(classOf[SortedIntIntersectSize].getName, "sorted_int_intersect_size"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SortedIntIntersectSize(exprs(0), exprs(1))))
  }
}
