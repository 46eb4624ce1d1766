package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingle hashes of a text column, in ONE pass:
  * split on ' ' → sliding n-gram join → md5 → first-4-bytes hash →
  * distinct. Replaces a chain of three interpreted higher-order
  * functions (transform/substr lambda, md5 transform, array_distinct)
  * whose per-element lambda dispatch dominated MinHash shingling.
  *
  * Hash semantics are bit-identical to StableHash32(concat_ws(' ',
  * slice(words, i, n))) — the DuckDB oracle replays them exactly.
  * CodegenFallback: per-row cost is md5-bound, not dispatch-bound.
  */
case class WordShingleHashes(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // ThreadLocal digest: expression instances must be thread-safe (see
  // StableHash32); the split pattern is hoisted off the per-row path
  @transient private lazy val md =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))
  @transient private lazy val space = Array[Byte](' ')
  @transient private lazy val spacePattern = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val digest = md.get()
    val words = input.asInstanceOf[UTF8String].split(spacePattern, -1)
    val count = math.max(words.length - (n - 1), 1)
    val seen = new java.util.HashSet[Long](count * 2)
    val out = new Array[Long](count)
    var outLen = 0
    var i = 0
    while (i < count) {
      digest.reset()
      var j = i
      val end = math.min(i + n, words.length)
      while (j < end) {
        if (j > i) digest.update(space)
        digest.update(words(j).getBytes)
        j += 1
      }
      val d = digest.digest()
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      if (seen.add(h)) { out(outLen) = h; outLen += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outLen))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "word_shingle_hashes"
}
