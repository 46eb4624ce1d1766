package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{ColumnBridge, DotProduct, SquaredL2Distance, UpperTriProducts}

/** Public handles for the native codegen vector expressions.
  *
  * `zip_with(a, b, multiply)` + `aggregate(..., sum)` is semantically a dot
  * product but materializes an intermediate array per row and walks lambda
  * plumbing per element. In pair-generating operators (near-dup scoring,
  * ANN ranking) this runs millions of times per task — the tight codegen'd
  * loop (graftbridge.BinaryVectorFold) removes the allocation and lambda
  * dispatch while staying inside whole-stage codegen.
  */
object VectorExpressions {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def l2sq(a: Column, b: Column): Column =
    ColumnBridge.column(SquaredL2Distance(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** d(d+1)/2 upper-triangle self-products per row — the covariance
    * pass summand (see UpperTriProducts for the codegen rationale). */
  def upperTriProducts(v: Column, dim: Int): Column =
    ColumnBridge.column(UpperTriProducts(ColumnBridge.expression(v), dim))
}
