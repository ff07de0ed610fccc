package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.GraftShims
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (with `doGenCode`) for the two hot
  * inner loops the higher-order-function formulations leave
  * interpreted — Spark's `aggregate`/`transform` are `CodegenFallback`,
  * so a per-token hash or per-pair dot product pays lambda-dispatch
  * per element. These compile into the whole-stage-generated Java
  * instead. Semantics are EXACTLY the HOF versions' (equivalence is
  * property-tested), so the DuckDB oracles are unaffected.
  */
object NativeExpressions {

  /** Portable polynomial hash: fold (h*31 + codepoint) % 1000000007
    * over the code points of the string — the codegen'd form of
    * [[GraftFunctions.portableHash]].
    */
  case class PortableHashExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nodeName: String = "graft_phash"

    override protected def nullSafeEval(input: Any): Any =
      PortableHashExpr.hash(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.NativeExpressions.PortableHashExpr.hash($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  object PortableHashExpr {
    /** Shared by interpreted and generated paths. */
    def hash(s: UTF8String): Long = {
      val str = s.toString
      var h = 0L
      var i = 0
      val n = str.length
      while (i < n) {
        val cp = str.codePointAt(i)
        h = (h * 31L + cp) % GraftFunctions.PhMod
        i += Character.charCount(cp)
      }
      h
    }
  }

  /** Integer dot product of two long arrays (null elements treated as
    * 0 is NOT needed — quantized vectors are never null; arrays of
    * different lengths dot over the common prefix, matching zip_with).
    */
  case class ArrayDotLongExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nodeName: String = "graft_dot"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      ArrayDotLongExpr.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.NativeExpressions.ArrayDotLongExpr.dot($a, $b)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  object ArrayDotLongExpr {
    def dot(a: ArrayData, b: ArrayData): Long = {
      val n = math.min(a.numElements(), b.numElements())
      var acc = 0L
      var i = 0
      while (i < n) {
        acc += a.getLong(i) * b.getLong(i)
        i += 1
      }
      acc
    }
  }

  /** Intersection size of two SORTED long arrays (linear merge). Used
    * for set-similarity verification where both sides were built with
    * array_sort — O(n+m), codegen'd, no intermediate array.
    */
  case class SortedIntersectSizeExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nodeName: String = "graft_sorted_intersect_size"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      SortedIntersectSizeExpr.size(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.NativeExpressions.SortedIntersectSizeExpr.size($a, $b)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  object SortedIntersectSizeExpr {
    def size(a: ArrayData, b: ArrayData): Long = {
      val na = a.numElements(); val nb = b.numElements()
      var i = 0; var j = 0; var n = 0L
      while (i < na && j < nb) {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { n += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
      n
    }
  }

  def sortedIntersectSize(a: Column, b: Column): Column =
    GraftShims.column(SortedIntersectSizeExpr(
      GraftShims.expression(a), GraftShims.expression(b)))

  def portableHashNative(s: Column): Column =
    GraftShims.column(PortableHashExpr(GraftShims.expression(s)))

  def dotLongNative(a: Column, b: Column): Column =
    GraftShims.column(ArrayDotLongExpr(
      GraftShims.expression(a), GraftShims.expression(b)))
}
