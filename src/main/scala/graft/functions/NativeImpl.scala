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

  /** Sorted distinct portable-hash set of the word tokens of `s` in
    * ONE pass — the fusion of
    * array_sort(array_distinct(transform(tokens(s), portableHash))).
    * Tokenization is exactly [[GraftFunctions.tokens]]: lowercase
    * (UTF8String semantics, same as Spark's lower()), then maximal
    * runs of [a-z0-9]; any other char — including all non-ASCII — is
    * a separator, which is precisely what splitting on [^a-z0-9]+
    * does. Token chars are ASCII, so folding chars equals folding
    * code points and the per-token hash matches portableHash.
    */
  def tokenHashSet(s: UTF8String): ArrayData = {
    val str = s.toLowerCase.toString
    val set = new java.util.TreeSet[java.lang.Long]()
    var h = 0L
    var in = false
    var i = 0
    val n = str.length
    while (i < n) {
      val c = str.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        h = (h * 31L + c) % GraftFunctions.PhMod
        in = true
      } else if (in) { set.add(h); h = 0L; in = false }
      i += 1
    }
    if (in) set.add(h)
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** All k minhash signature values of a hash set in one pass — the
    * fusion of k× array_min(transform(hs, h -> (h*a_j + b_j) % p)).
    * Returns null for an empty set, matching array_min(empty) = null
    * per signature (callers treat a null signature vector as k nulls).
    */
  def minhashSigs(hs: ArrayData, k: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return null
    val as = Array.tabulate(k)(GraftFunctions.minhashA)
    val bs = Array.tabulate(k)(GraftFunctions.minhashB)
    val sigs = new Array[Long](k)
    java.util.Arrays.fill(sigs, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val v = (h * as(j) + bs(j)) % GraftFunctions.MinhashPrime
        if (v < sigs(j)) sigs(j) = v
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sigs)
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
