package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash-signature aggregator (SURVEY table N, N_UDAF1): folds
  * a stream of tokens into a k-wide signature, element i being the
  * lexicographic minimum of md5("i:token") hex prefixes — the same
  * md5-salted "permutation" scheme as [[graft.dedup.Dedup]], so the
  * aggregate is order-insensitive, mergeable (associative+commutative
  * element-wise min), and reproducible across engines.
  *
  * Being an [[Aggregator]] it runs as a proper partial/final aggregate:
  * map-side signatures per partition, tiny k-string buffers through
  * the shuffle — the shape a 100 TB corpus needs.
  */
object MinHashAgg extends Aggregator[String, Array[String], Array[String]] {
  val K = 4
  private val PrefixLen = 16

  private def md5hex(s: String): String = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    d.map(b => f"$b%02x").mkString
  }

  override def zero: Array[String] = Array.fill(K)(null)

  override def reduce(buf: Array[String], tok: String): Array[String] = {
    var i = 0
    while (i < K) {
      val cand = md5hex(s"$i:$tok").substring(0, PrefixLen)
      if (buf(i) == null || cand < buf(i)) buf(i) = cand
      i += 1
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < K) {
      if (a(i) == null || (b(i) != null && b(i) < a(i))) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[String]): Array[String] = buf

  override def bufferEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
