package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hot paths where composing built-in
  * higher-order functions would cost one closure dispatch per element.
  * These run as single tight JVM loops per row (CodegenFallback wraps the
  * eval; the loop itself is branch-light primitive code).
  */
object expressions {

  /** 64-bit SimHash of whitespace-tokenized text. For each token, a 64-bit
    * hash votes ±1 per bit position; the sign vector becomes the fingerprint.
    * Near-duplicate docs differ in few bits (compare with bit_count(a^b)).
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression with codegen.CodegenFallback {
    override def dataType: DataType = LongType

    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      val counts = new Array[Int](64)
      var i = 0
      val n = s.length
      while (i < n) {
        while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
        val start = i
        while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
        if (i > start) {
          var h: Long = 1125899906842597L // FNV-ish seed
          var j = start
          while (j < i) { h = h * 31 + s.charAt(j); j += 1 }
          // finalize (xorshift mix for avalanche)
          h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
      java.lang.Long.valueOf(out)
    }
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
    override def prettyName: String = "simhash64"
  }

  /** Cosine similarity of two float-array embeddings — one fused loop, no
    * per-element closure dispatch. NULL if either side is NULL or lengths
    * differ; 0.0 when either norm is zero.
    */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression with codegen.CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n != b.numElements()) return null
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = a.getFloat(i).toDouble
        val y = b.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      if (na == 0.0 || nb == 0.0) java.lang.Double.valueOf(0.0)
      else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "cosine_similarity"
  }

  /** Dot product against a constant query vector (broadcast as a literal) —
    * the ANN scoring hot loop.
    */
  case class DotConst(child: Expression, query: Array[Double])
      extends UnaryExpression with codegen.CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), query.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += a.getFloat(i).toDouble * query(i); i += 1 }
      java.lang.Double.valueOf(dot)
    }
    override protected def withNewChildInternal(c: Expression): DotConst = copy(child = c)
    override def prettyName: String = "dot_const"
  }

  /** Rolling-hash (Rabin-Karp style) document fingerprint over normalized
    * text: lowercased, whitespace collapsed — stable under reformatting.
    */
  case class RollingFingerprint(child: Expression)
      extends UnaryExpression with codegen.CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      var h = 0xcbf29ce484222325L // FNV-1a 64 offset basis
      var prevSpace = true
      var i = 0
      val n = s.length
      while (i < n) {
        val c0 = s.charAt(i)
        val isSpace = Character.isWhitespace(c0)
        if (!isSpace) {
          h ^= Character.toLowerCase(c0).toLong
          h *= 0x100000001b3L
          prevSpace = false
        } else if (!prevSpace) {
          h ^= ' '.toLong; h *= 0x100000001b3L
          prevSpace = true
        }
        i += 1
      }
      java.lang.Long.valueOf(h)
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
    override def prettyName: String = "rolling_fingerprint"
  }

  // ----- Column wrappers ---------------------------------------------------

  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def ex(c: Column): Expression = ColumnBridge.expression(c)

  def simhash64(c: Column): Column = col(SimHash64(ex(c)))
  def cosineSimilarity(a: Column, b: Column): Column =
    col(CosineSimilarity(ex(a), ex(b)))
  def dotConst(c: Column, q: Array[Double]): Column = col(DotConst(ex(c), q))
  def rollingFingerprint(c: Column): Column = col(RollingFingerprint(ex(c)))
}
