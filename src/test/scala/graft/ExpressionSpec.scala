package graft

import org.apache.spark.sql.functions._
import graft.sim.Similarity

/** The native codegen'd expression surface ([[graft.functions.CosineSim]]
  * via [[GraftExtensions]]): SQL registration, bit-equality with the
  * HOF formulation, and codegen compatibility.
  */
class ExpressionSpec extends GraftSpec {
  import spark.implicits._

  private lazy val vecs = Tables.embeddings(spark, sf())
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  test("graft_cosine registers through GraftExtensions and runs in SQL") {
    GraftExtensions.register(spark)
    vecs.createOrReplaceTempView("vecs_sql")
    val r = spark.sql(
      "SELECT graft_cosine(v, v) AS c FROM vecs_sql LIMIT 5")
      .as[Double].collect()
    assert(r.length == 5 && r.forall(c => math.abs(c - 1.0) < 1e-12))
  }

  test("native cosine is bit-identical to the HOF fold") {
    val q = vecs.filter(col("vec_id") === 0)
      .select(col("v").as("qv"))
    val joined = vecs.crossJoin(broadcast(q))
    val native = Similarity.cosineNative(vecs, "v", "qv")
    val hof = Similarity.dot("v", "qv") /
      (sqrt(Similarity.dot("v", "v")) * sqrt(Similarity.dot("qv", "qv")))
    val diffs = joined
      .select((native === hof || (isnan(native) && isnan(hof))).as("same"))
      .filter(!col("same")).count()
    assert(diffs == 0) // exact ==, not tolerance: same fp op order
  }

  test("graft_cosine participates in whole-stage codegen") {
    GraftExtensions.register(spark)
    val q = vecs.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val df = vecs.crossJoin(broadcast(q))
      .select(expr("graft_cosine(v, qv)").as("c"))
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' is the whole-stage-codegen stage marker: the projection
    // evaluating graft_cosine must carry one (no fallback to
    // interpreted eval).
    assert("""\*\(\d+\) Project \[graft_cosine""".r
      .findFirstIn(plan).isDefined, plan)
  }

  test("null inputs yield null, not a crash") {
    GraftExtensions.register(spark)
    val df = Seq((Some(Seq(1.0, 0.0)), None: Option[Seq[Double]]))
      .toDF("a", "b")
    val out = df.selectExpr("graft_cosine(a, b) AS c")
      .select(col("c").isNull).as[Boolean].head()
    assert(out)
  }

  test("bounded collect matches collect_list/set when under the limit") {
    GraftExtensions.register(spark)
    val df = spark.range(0, 1000)
      .select((col("id") % 10).as("g"), (col("id") % 7).as("v"))
    df.createOrReplaceTempView("bc_in")
    val bounded = spark.sql(
      """SELECT g, array_sort(graft_collect_bounded(v, 1000)) AS l,
        |  array_sort(graft_collect_set_bounded(v, 1000)) AS s
        |FROM bc_in GROUP BY g""".stripMargin)
    val plain = spark.sql(
      """SELECT g, array_sort(collect_list(v)) AS l,
        |  array_sort(collect_set(v)) AS s
        |FROM bc_in GROUP BY g""".stripMargin)
    assert(bounded.except(plain).isEmpty && plain.except(bounded).isEmpty)
  }

  test("bounded collect fails FAST past the group-width limit") {
    GraftExtensions.register(spark)
    spark.range(0, 10000).select(lit(1).as("g"), col("id").as("v"))
      .createOrReplaceTempView("bc_wide")
    val e = intercept[Exception] {
      spark.sql("SELECT g, graft_collect_bounded(v, 100) FROM bc_wide " +
        "GROUP BY g").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("graft.maxGroupWidth")),
      s"expected group-width error, got: ${msgs(e).mkString(" | ")}")
    // The set variant absorbs duplicates BEFORE the guard: 10k rows of
    // 50 distinct values stay under a 100-element limit.
    spark.range(0, 10000)
      .select(lit(1).as("g"), (col("id") % 50).as("v"))
      .createOrReplaceTempView("bc_dup")
    val ok = spark.sql(
      "SELECT size(graft_collect_set_bounded(v, 100)) AS n FROM bc_dup " +
        "GROUP BY g").collect()
    assert(ok.head.getInt(0) === 50)
  }

  test("graft_token matches the connector's ring positions from SQL") {
    GraftExtensions.register(spark)
    import graft.sources.{KeyCodec, KeyPart, KeySpec, ValueCodec}
    // text key: SQL value == KeyCodec hash
    val t = spark.sql("SELECT graft_token('user-3') AS t")
      .as[Long].head()
    val spec = KeySpec(
      List(KeyPart("user", ValueCodec.StringTag, 0, 0)), Nil)
    assert(t == KeyCodec.token(spec, Array(
      org.apache.spark.unsafe.types.UTF8String.fromString("user-3"))))
    // single bigint key: identity (the default layout's token IS pk)
    assert(spark.sql("SELECT graft_token(CAST(42 AS BIGINT)) AS t")
      .as[Long].head() == 42L)
    // composite key hashes over all parts, in order
    val t2 = spark.sql(
      "SELECT graft_token('tenant-1', CAST(7 AS BIGINT)) AS t")
      .as[Long].head()
    val spec2 = KeySpec(List(
      KeyPart("a", ValueCodec.StringTag, 0, 0),
      KeyPart("b", ValueCodec.LongTag, 0, 0)), Nil)
    assert(t2 == KeyCodec.token(spec2, Array(
      org.apache.spark.unsafe.types.UTF8String.fromString("tenant-1"),
      7L)))
    // composes with the _token scan column end-to-end: the point
    // predicate addresses exactly user-3's partition
    val kdir = graft.sources.CellSnapshots.ensureKeyed(spark, sf())
    spark.read.format("graft.sources.CellSource")
      .option("withToken", "true").load(kdir)
      .createOrReplaceTempView("keyed_tok")
    val users = spark.sql(
      "SELECT DISTINCT user FROM keyed_tok " +
        "WHERE _token = graft_token('user-3')").as[String].collect()
    assert(users.toSet == Set("user-3"))
    // null propagates
    assert(spark.sql("SELECT graft_token(CAST(NULL AS STRING)) AS t")
      .head().isNullAt(0))
  }

  test("frozen UDT pack/unpack round-trips incl. nulls (C59)") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_udt_unpack('a bigint,b string,c double', " +
        "graft_udt_pack('a bigint,b string,c double', " +
        "CAST(7 AS BIGINT), 'hi', CAST(2.5 AS DOUBLE))) AS u")
      .select("u.a", "u.b", "u.c").head()
    assert(r.getLong(0) == 7L && r.getString(1) == "hi" &&
      r.getDouble(2) == 2.5)
    // null field: packed as length -1, unpacks as null
    val n = spark.sql(
      "SELECT graft_udt_unpack('a bigint,b string', " +
        "graft_udt_pack('a bigint,b string', CAST(NULL AS BIGINT), " +
        "'x')) AS u").select("u.a", "u.b").head()
    assert(n.isNullAt(0) && n.getString(1) == "x")
  }

  test("UDT schema evolution: old layout reads new blobs and vice versa") {
    graft.GraftExtensions.register(spark)
    // blob written with an EXTRA trailing field still unpacks under
    // the older two-field layout (trailing bytes ignored)...
    val oldRead = spark.sql(
      "SELECT graft_udt_unpack('a bigint,b string', " +
        "graft_udt_pack('a bigint,b string,c int', " +
        "CAST(1 AS BIGINT), 'y', 9)) AS u")
      .select("u.a", "u.b").head()
    assert(oldRead.getLong(0) == 1L && oldRead.getString(1) == "y")
    // ...and a blob written BEFORE a field existed unpacks the new
    // field as null (Cassandra's add-field evolution rule)
    val newRead = spark.sql(
      "SELECT graft_udt_unpack('a bigint,b string,c int', " +
        "graft_udt_pack('a bigint,b string', " +
        "CAST(1 AS BIGINT), 'y')) AS u")
      .select("u.a", "u.b", "u.c").head()
    assert(newRead.getLong(0) == 1L && newRead.getString(1) == "y" &&
      newRead.isNullAt(2))
  }

  test("UDT pack refuses arity and type mismatches") {
    graft.GraftExtensions.register(spark)
    intercept[Exception] {
      spark.sql("SELECT graft_udt_pack('a bigint', 1L, 'extra')")
        .collect()
    }
    intercept[Exception] {
      spark.sql("SELECT graft_udt_pack('a bigint', 'not-a-long')")
        .collect()
    }
  }

  test("VectorCodec parameterized planes: prefix buckets, " +
    "Hamming-ball probe order, SQL 2-arg form") {
    import graft.functions.VectorCodec
    val v = VectorCodec.encode(Array(1.5f, -2.25f, 0.5f, 3f, -1f, 4f))
    // plane p's signs hash "p:i" independent of the TOTAL count, so
    // the 4-plane bucket is exactly the low 4 bits of the 12-plane one
    assert(VectorCodec.bucket(v) === VectorCodec.bucket(v, 4))
    assert((VectorCodec.bucket(v, 12) & 0xfL) === VectorCodec.bucket(v, 4))
    // probeBuckets reproduces probeOrder's (distance, id) order at the
    // default geometry for every prefix length
    val q = VectorCodec.bucket(v, 4)
    val full = VectorCodec.probeOrder(q)
    for (n <- 1 to 16)
      assert(VectorCodec.probeBuckets(q, 4, n) === full.take(n))
    // 12 planes: ball is distance-first, ties ascending by bucket id
    val q12 = VectorCodec.bucket(v, 12)
    val ball = VectorCodec.probeBuckets(q12, 12, 8)
    assert(ball.head === q12)
    val dists = ball.map(b => java.lang.Long.bitCount(b ^ q12))
    assert(dists === dists.sorted)
    assert(ball.distinct.length === 8)
    assert(ball.tail.forall(b => java.lang.Long.bitCount(b ^ q12) <= 2))
    // nprobe past the bucket count truncates to the full ring set
    assert(VectorCodec.probeBuckets(0L, 2, 99).sorted === Seq(0L, 1L, 2L, 3L))
    // out-of-range planes refuse by name
    intercept[IllegalArgumentException] {
      VectorCodec.probeBuckets(0L, 0, 1)
    }
    intercept[IllegalArgumentException] {
      VectorCodec.probeBuckets(0L, VectorCodec.MaxPlanes + 1, 1)
    }
    // SQL: the optional second argument selects the plane count
    GraftExtensions.register(spark)
    val hex = v.map("%02x".format(_)).mkString
    val row = spark.sql(
      s"SELECT graft_vec_bucket(unhex('$hex')) AS b4, " +
        s"graft_vec_bucket(unhex('$hex'), 12) AS b12").head()
    assert(row.getLong(0) === VectorCodec.bucket(v, 4))
    assert(row.getLong(1) === VectorCodec.bucket(v, 12))
  }
}
