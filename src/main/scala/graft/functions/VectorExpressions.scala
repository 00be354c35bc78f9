package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression for cosine similarity of two
  * `array<double>` columns — the hot-path primitive of every
  * similarity/ANN operator (SURVEY table N).
  *
  * Versus the HOF formulation (`aggregate(zip_with(a, b, (x, y) ->
  * x*y), 0d, (acc, v) -> acc + v)` three times over), the fused
  * whole-stage-codegen loop reads each element once from ArrayData
  * with no lambda-variable boxing and no intermediate product array —
  * at 100 TB the scoring loop is the dominant per-row cost of a
  * brute-force or IVF scan, so it must be a tight primitive loop.
  *
  * Floating-point equivalence: all three accumulators add in ascending
  * element order, exactly the sequential-fold order of
  * [[graft.sim.Similarity.dot]] — results are bit-identical to the HOF
  * form (and so to the DuckDB `list_dot_product` oracles).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** Native dot product of two `array<double>` columns — the per-pair
  * primitive of the blocked/IVF similarity joins, where norms are
  * precomputed per vector and only the cross-term is per pair. Same
  * ascending-index accumulation as the HOF fold
  * (`aggregate(zip_with(a, b, (x, y) -> x*y), 0d, (acc, v) -> acc+v)`),
  * so results are bit-identical to [[graft.sim.Similarity.dot]] and
  * the DuckDB `list_dot_product` oracles. Null ARRAYS yield null;
  * elements are assumed non-null (enforced by the embedding schema).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** The C70 vector wire format and its LSH bucketing.
  *
  * A CQL `vector<float, n>` cell stores exactly `4*n` bytes —
  * IEEE-754 floats big-endian in declared order (Cassandra's own
  * serialization of the type). Decode is a per-row primitive-array
  * copy; the LSH bucket is 4 sign bits of fixed MD5-derived
  * hyperplanes — deterministic with NO trained state, so the index
  * build, write-through refresh, and the query-time probe order all
  * derive identical buckets with nothing persisted but the entries
  * (the same derivation as [[graft.sim.Similarity.hyperplaneBuckets]],
  * kept bit-compatible in spirit: sign = first md5 hex digit of
  * `"plane:pos"` >= '8').
  *
  * Scale: sign-LSH buckets are the stateless corner of IVF — cosine
  * neighbors share sign patterns, so probing the query's bucket plus
  * its nearest Hamming neighbors bounds the candidate read to
  * nprobe/2^planes of the index while high-cosine rows stay
  * reachable. The codebook that FAISS would train is replaced by
  * arithmetic; nothing broadcasts, nothing drifts stale.
  */
object VectorCodec {
  /** Default hyperplane count — 2^Planes buckets. Kept at 4 for
    * compatibility with indexes built before the per-index option
    * existed; a production-scale index declares its own count
    * (`CREATE INDEX … WITH OPTIONS = {'planes': '12'}`) persisted in
    * the index metadata, so build, write-through refresh and the
    * query-time probe all derive identical buckets.
    */
  val Planes = 4

  /** Hard ceiling on the declared plane count: 2^20 buckets is
    * already far past any single table's useful bucket granularity,
    * and the probe-order enumeration stays trivially cheap below it.
    */
  val MaxPlanes = 20

  /** Buckets probed by an ANN read (the query's bucket plus its
    * nearest Hamming neighbors). At the default 4 planes this is
    * 1/4 of the 16 buckets; a 12-plane index at the same nprobe
    * reads 4/4096 ≈ 0.1% of the entries — the scale lever.
    */
  val DefaultProbes = 4

  private val signCache = new java.util.concurrent
    .ConcurrentHashMap[(Int, Int), Array[Array[Float]]]()

  /** The first `planes` hyperplane sign vectors for dimension `dim`
    * — derived once per (JVM, dim, planes), embedded nowhere,
    * identical on every node and every session. Plane `p`'s signs do
    * not depend on the TOTAL plane count (each hashes `"p:i"`), so a
    * 4-plane bucket is exactly the low 4 bits of the same vector's
    * 12-plane bucket.
    */
  private def signs(dim: Int, planes: Int): Array[Array[Float]] =
    signCache.computeIfAbsent((dim, planes), { case (d, np) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(np) { p =>
        Array.tabulate(d) { i =>
          val h = md.digest(s"$p:$i".getBytes(
            java.nio.charset.StandardCharsets.UTF_8))
          // first hex digit >= '8' == top bit of the first byte set
          if ((h(0) & 0x80) != 0) 1.0f else -1.0f
        }
      }
    })

  def dims(bytes: Array[Byte]): Int = bytes.length / 4

  def floatAt(bytes: Array[Byte], i: Int): Float = {
    val o = i * 4
    java.lang.Float.intBitsToFloat(
      ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff))
  }

  /** Encode floats to the wire form (the literal parser's writer). */
  def encode(vs: Array[Float]): Array[Byte] = {
    val out = new Array[Byte](vs.length * 4)
    var i = 0
    while (i < vs.length) {
      val b = java.lang.Float.floatToIntBits(vs(i))
      out(i * 4) = (b >>> 24).toByte
      out(i * 4 + 1) = (b >>> 16).toByte
      out(i * 4 + 2) = (b >>> 8).toByte
      out(i * 4 + 3) = b.toByte
      i += 1
    }
    out
  }

  /** `graft_vec_decode`'s kernel: wire bytes → float ArrayData. */
  def decode(bytes: Array[Byte]): ArrayData = {
    val n = dims(bytes)
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = floatAt(bytes, i); i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** `graft_vec_bucket`'s kernel: the vector's LSH bucket in
    * `[0, 2^planes)` — bit p set iff the dot with hyperplane p is
    * non-negative.
    */
  def bucket(bytes: Array[Byte], planes: Int): Long = {
    val n = dims(bytes)
    val sg = signs(n, planes)
    var b = 0L
    var p = 0
    while (p < planes) {
      var s = 0.0
      var i = 0
      val row = sg(p)
      while (i < n) { s += floatAt(bytes, i) * row(i); i += 1 }
      if (s >= 0.0) b |= (1L << p)
      p += 1
    }
    b
  }

  /** Default-plane-count bucket (pre-option indexes). */
  def bucket(bytes: Array[Byte]): Long = bucket(bytes, Planes)

  /** Probe order for a query bucket: every bucket sorted by Hamming
    * distance to it (ties by id) — multi-probe LSH's standard order.
    */
  def probeOrder(queryBucket: Long): Seq[Long] =
    (0L until (1L << Planes)).sortBy(b =>
      (java.lang.Long.bitCount(b ^ queryBucket), b))

  /** The first `nprobe` buckets of the Hamming ball around
    * `queryBucket` over `planes` planes — enumerated distance-first
    * (ties by bucket id, the same order [[probeOrder]] sorts into)
    * WITHOUT materializing all 2^planes buckets, so a 20-plane index
    * probes in microseconds. Multi-probe LSH's standard order.
    */
  def probeBuckets(queryBucket: Long, planes: Int,
      nprobe: Int): Seq[Long] = {
    require(planes >= 1 && planes <= MaxPlanes,
      s"planes must be in [1, $MaxPlanes], got $planes")
    val total = 1L << planes
    val want = math.min(nprobe.toLong, total).toInt
    val out = new scala.collection.mutable.ArrayBuffer[Long](want)
    var d = 0
    while (out.length < want && d <= planes) {
      // all masks with d of `planes` bits set, ascending by the
      // RESULTING bucket id: collect this distance ring, sort, take
      val ring = combinations(planes, d).map(_ ^ queryBucket).sorted
      ring.iterator.take(want - out.length).foreach(out += _)
      d += 1
    }
    out.toSeq
  }

  /** All `width`-bit masks with exactly `bits` bits set. Ring sizes
    * are C(planes, d) — bounded by the caller's early exit at
    * `nprobe`, which is always tiny relative to 2^planes.
    */
  private def combinations(width: Int, bits: Int): Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    def rec(start: Int, left: Int, acc: Long): Unit =
      if (left == 0) out += acc
      else {
        var i = start
        while (i <= width - left) {
          rec(i + 1, left - 1, acc | (1L << i))
          i += 1
        }
      }
    rec(0, bits, 0L)
    out.toSeq
  }
}

/** `graft_vec_decode(binary)` → `array<float>` — the wire form back
  * to a transformable array, codegen'd (the ANN rerank scores
  * candidates with it inside whole-stage codegen).
  */
case class VecDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_vec_decode takes binary, got " +
        child.dataType.simpleString)

  override def dataType: DataType = ArrayType(FloatType,
    containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    VectorCodec.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorCodec.decode($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "graft_vec_decode"
}

/** `graft_vec_bucket(binary[, planes])` → `bigint` — the vector's
  * LSH bucket over the index's declared plane count; the C70 ANN
  * index derives one entry key per vector cell with it (per-row on
  * the build/refresh delta, so codegen matters). The plane count is
  * a PLAN-TIME constant (read from the index metadata), not a
  * column — it bakes into the generated code.
  */
case class VecBucket(child: Expression,
    planes: Int = VectorCodec.Planes) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType) TypeCheckResult.TypeCheckFailure(
      s"graft_vec_bucket takes binary, got " +
        child.dataType.simpleString)
    else if (planes < 1 || planes > VectorCodec.MaxPlanes)
      TypeCheckResult.TypeCheckFailure(
        s"graft_vec_bucket planes must be in " +
          s"[1, ${VectorCodec.MaxPlanes}], got $planes")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    VectorCodec.bucket(input.asInstanceOf[Array[Byte]], planes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorCodec.bucket($c, $planes)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "graft_vec_bucket"
}
