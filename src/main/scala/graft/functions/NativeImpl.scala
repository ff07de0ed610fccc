package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Static implementations shared by the interpreted (`nullSafeEval`)
  * and generated (`doGenCode`) paths of [[NativeExpressions]].
  *
  * MUST stay a top-level object: Scala emits a mirror class
  * `graft.functions.NativeImpl` with *static forwarders* for a
  * top-level object, and Janino (Spark's whole-stage-codegen
  * compiler) can only resolve plain static calls. A nested object
  * (`NativeExpressions.PortableHashExpr.hash`) compiles to
  * `NativeExpressions$PortableHashExpr$.MODULE$.hash`, which Janino
  * cannot see — generated code then fails to compile and Spark
  * silently drops the whole stage to interpreted execution.
  */
object NativeImpl {

  /** Portable polynomial hash: fold (h*31 + codepoint) % 1000000007
    * over the code points of the string. Matches
    * [[GraftFunctions.portableHashHof]] and the DuckDB oracle.
    */
  def portableHash(s: UTF8String): Long = {
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

  /** Integer dot product of two long arrays over the common prefix
    * (matching zip_with semantics on unequal lengths).
    */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  /** Intersection size of two SORTED long arrays (linear merge). */
  def sortedIntersectSize(a: ArrayData, b: ArrayData): Long = {
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
