package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GQuery, Tables}

/** SURVEY §2 table F — scalar function families, one declared query per
  * family exercising every cross-engine-checkable function, plus the
  * generator surface (Q_GEN*: explode / posexplode / JSON extraction).
  *
  * All functions here are Spark built-ins (`functions._` / `expr`), so
  * every expression stays inside WholeStageCodegen — no UDFs in any hot
  * path (SURVEY §4). Each query samples its table with a cheap modulo
  * predicate that pushes into the parquet scan.
  *
  * Cross-engine notes baked into the oracles (probed on DuckDB 1.0):
  * - int-returning Spark fns (length, instr, size, datediff, year…) map
  *   to BIGINT in DuckDB → CAST to INTEGER in the oracle;
  * - Spark dayofweek is 1-based Sunday, DuckDB 0-based → `+1`;
  * - Spark floor/ceil(double) return LONG, DuckDB DOUBLE → CAST;
  * - DuckDB has no initcap / months_between — excluded;
  * - transcendentals (exp/ln/log10) differ by 1 ulp between libm and
  *   the JVM → ROUND(…, 6); sqrt is IEEE-exact → raw;
  * - double→string casts format differently (1.0E15 vs 1e15) — never
  *   emitted; double→int casts round in DuckDB but truncate in Spark —
  *   never used.
  */
object Functions {

  // F_STR1 — basic string family.
  private def strBasic(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_partkey") % 7 === 0)
      .select(
        col("p_partkey"),
        concat_ws("-", upper(col("p_brand")), lower(col("p_type"))).as("cw"),
        substring(col("p_name"), 1, 4).as("sub"),
        upper(col("p_name")).as("up"),
        length(col("p_name")).as("len"),
        lpad(col("p_brand"), 10, "*").as("lp"),
        rpad(col("p_brand"), 10, "#").as("rp"),
        trim(lit("  pad  ")).as("tr"),
        reverse(col("p_name")).as("rev"),
        instr(col("p_name"), "a").as("pos_a"),
        regexp_replace(col("p_name"), lit(" "), lit("_")).as("repl"))
      .orderBy(col("p_partkey"))

  private val strBasicSql =
    """SELECT p_partkey,
      |  concat_ws('-', upper(p_brand), lower(p_type)) AS cw,
      |  substr(p_name, 1, 4) AS sub,
      |  upper(p_name) AS up,
      |  CAST(length(p_name) AS INTEGER) AS len,
      |  lpad(p_brand, 10, '*') AS lp,
      |  rpad(p_brand, 10, '#') AS rp,
      |  trim('  pad  ') AS tr,
      |  reverse(p_name) AS rev,
      |  CAST(strpos(p_name, 'a') AS INTEGER) AS pos_a,
      |  replace(p_name, ' ', '_') AS repl
      |FROM part WHERE p_partkey % 7 = 0 ORDER BY p_partkey""".stripMargin

  // F_STR2 — regex / split family.
  private def strRegex(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_partkey") % 7 === 0)
      .select(
        col("p_partkey"),
        element_at(split(col("p_name"), " "), 1).as("first_word"),
        regexp_replace(col("p_name"), "[aeiou]", "*").as("devowel"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        col("p_name").rlike("^s").as("starts_s"),
        translate(col("p_name"), "aeiou", "AEIOU").as("trans"))
      .orderBy(col("p_partkey"))

  private val strRegexSql =
    """SELECT p_partkey,
      |  string_split(p_name, ' ')[1] AS first_word,
      |  regexp_replace(p_name, '[aeiou]', '*', 'g') AS devowel,
      |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
      |  regexp_matches(p_name, '^s') AS starts_s,
      |  translate(p_name, 'aeiou', 'AEIOU') AS trans
      |FROM part WHERE p_partkey % 7 = 0 ORDER BY p_partkey""".stripMargin

  // F_DATE1 — date part extraction.
  private def dateParts(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") % 20 === 0)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("q"),
        dayofweek(col("o_orderdate")).as("dow"),
        weekofyear(col("o_orderdate")).as("woy"))
      .orderBy(col("o_orderkey"))

  private val datePartsSql =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INTEGER) AS y,
      |  CAST(month(o_orderdate) AS INTEGER) AS m,
      |  CAST(day(o_orderdate) AS INTEGER) AS dom,
      |  CAST(quarter(o_orderdate) AS INTEGER) AS q,
      |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
      |  CAST(weekofyear(o_orderdate) AS INTEGER) AS woy
      |FROM orders WHERE o_orderkey % 20 = 0 ORDER BY o_orderkey""".stripMargin

  // F_DATE2 — date arithmetic (add_months end-of-month clamping matches
  // DuckDB's interval addition — probed: 2024-01-31 + 1 mo = 2024-02-29).
  private def dateArith(s: SparkSession, d: String): DataFrame = {
    val dt = col("o_orderdate").cast("date")
    Tables.orders(s, d)
      .filter(col("o_orderkey") % 20 === 0)
      .select(
        col("o_orderkey"),
        date_add(dt, 30).as("plus30"),
        datediff(dt, lit("1995-01-01").cast("date")).as("days_since"),
        add_months(dt, 2).as("plus2mo"),
        last_day(dt).as("eom"),
        trunc(dt, "MM").as("month_start"))
      .orderBy(col("o_orderkey"))
  }

  private val dateArithSql =
    """SELECT o_orderkey,
      |  CAST(o_orderdate AS DATE) + 30 AS plus30,
      |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2mo,
      |  last_day(CAST(o_orderdate AS DATE)) AS eom,
      |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
      |FROM orders WHERE o_orderkey % 20 = 0 ORDER BY o_orderkey""".stripMargin

  // F_DATE3 — epoch seconds / formatting / time-of-day parts on events.
  private def dateEpoch(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("user_id") % 25 === 0)
      .select(
        col("event_id"),
        unix_timestamp(col("ts")).as("epoch_s"),
        from_unixtime(unix_timestamp(col("ts"))).as("fmt"),
        hour(col("ts")).as("h"),
        minute(col("ts")).as("mi"),
        second(col("ts")).as("sec"))
      .orderBy(col("event_id"))

  private val dateEpochSql =
    """SELECT event_id,
      |  CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
      |  strftime(make_timestamp(CAST(floor(epoch(ts)) AS BIGINT) * 1000000),
      |           '%Y-%m-%d %H:%M:%S') AS fmt,
      |  CAST(hour(ts) AS INTEGER) AS h,
      |  CAST(minute(ts) AS INTEGER) AS mi,
      |  CAST(second(date_trunc('second', ts)) AS INTEGER) AS sec
      |FROM events WHERE user_id % 25 = 0 ORDER BY event_id""".stripMargin

  // F_MATH1 — math scalar family.
  private def mathScalar(s: SparkSession, d: String): DataFrame = {
    val x = col("o_totalprice")
    Tables.orders(s, d)
      .filter(col("o_orderkey") % 20 === 0)
      .select(
        col("o_orderkey"),
        abs(x - 100000.0).as("absx"),
        floor(x).as("fl"),
        ceil(x).as("ce"),
        sqrt(x).as("sq"),
        round(log(x), 6).as("lnx"),
        round(log10(x), 6).as("l10"),
        round(exp(x / 1000000.0), 6).as("ex"),
        pow(col("o_custkey") % 10, 2).as("pw"),
        pmod(col("o_custkey") - 100, lit(7)).as("pm"),
        signum(x - 100000.0).cast("int").as("sg"),
        greatest(x, lit(100000.0)).as("gr"),
        least(x, lit(100000.0)).as("le"))
      .orderBy(col("o_orderkey"))
  }

  private val mathScalarSql =
    """SELECT o_orderkey,
      |  abs(o_totalprice - 100000.0) AS absx,
      |  CAST(floor(o_totalprice) AS BIGINT) AS fl,
      |  CAST(ceil(o_totalprice) AS BIGINT) AS ce,
      |  sqrt(o_totalprice) AS sq,
      |  ROUND(ln(o_totalprice), 6) AS lnx,
      |  ROUND(log10(o_totalprice), 6) AS l10,
      |  ROUND(exp(o_totalprice / 1000000.0), 6) AS ex,
      |  CAST(pow(o_custkey % 10, 2) AS DOUBLE) AS pw,
      |  ((o_custkey - 100) % 7 + 7) % 7 AS pm,
      |  CAST(sign(o_totalprice - 100000.0) AS INTEGER) AS sg,
      |  greatest(o_totalprice, 100000.0) AS gr,
      |  least(o_totalprice, 100000.0) AS le
      |FROM orders WHERE o_orderkey % 20 = 0 ORDER BY o_orderkey""".stripMargin

  // F_ARR1 — array family (set-ops order-normalized via array_sort,
  // SURVEY §7.4 rule 5; DuckDB list_distinct does NOT preserve order).
  // Every array output is '|'-joined: the driver's comparer hashes
  // scalars only (array cells are unhashable on its pandas side).
  private def arrBasic(s: SparkSession, d: String): DataFrame = {
    val words = split(col("p_name"), " ")
    def j(c: org.apache.spark.sql.Column) =
      array_join(c.cast("array<string>"), "|")
    Tables.part(s, d)
      .filter(col("p_partkey") % 13 === 0)
      .select(
        col("p_partkey"),
        size(words).as("n"),
        array_contains(words, "small").as("has_small"),
        j(sort_array(words)).as("sorted_words"),
        j(slice(sort_array(words), 1, 2)).as("first2"),
        j(array_sort(array_distinct(words))).as("dist"),
        j(array_sort(array_union(words, array(lit("ring"), lit("zzz")))))
          .as("un"),
        j(array_sort(array_intersect(words, array(lit("small"), lit("ring")))))
          .as("inter"),
        j(array_sort(array_except(words, array(lit("small"))))).as("exc"),
        j(flatten(array(words, array(lit("x"))))).as("flat"),
        j(sequence(lit(1), col("p_size") % 4 + 1)).as("seq"))
      .orderBy(col("p_partkey"))
  }

  private val arrBasicSql =
    """SELECT p_partkey,
      |  CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n,
      |  list_contains(string_split(p_name, ' '), 'small') AS has_small,
      |  array_to_string(list_sort(string_split(p_name, ' ')), '|') AS sorted_words,
      |  array_to_string(list_slice(list_sort(string_split(p_name, ' ')), 1, 2), '|') AS first2,
      |  array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), '|') AS dist,
      |  array_to_string(list_sort(list_distinct(string_split(p_name, ' ') || ['ring', 'zzz'])), '|') AS un,
      |  COALESCE(array_to_string(list_sort(list_intersect(string_split(p_name, ' '), ['small', 'ring'])), '|'), '') AS inter,
      |  COALESCE(array_to_string(list_sort(list_filter(list_distinct(string_split(p_name, ' ')),
      |    w -> w <> 'small')), '|'), '') AS exc,
      |  array_to_string(flatten([string_split(p_name, ' '), ['x']]), '|') AS flat,
      |  array_to_string(list_transform(range(1, p_size % 4 + 2), x -> CAST(x AS INTEGER)), '|') AS seq
      |FROM part WHERE p_partkey % 13 = 0 ORDER BY p_partkey""".stripMargin

  // F_ARR2 — higher-order functions: transform/filter/aggregate/
  // exists/forall/zip_with (the primitives N_SIM* builds on). Array
  // outputs '|'-joined for the driver's scalar-only comparer.
  private def arrHof(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_partkey") % 13 === 0)
      .withColumn("words", split(col("p_name"), " "))
      .withColumn("nums", sequence(lit(1), col("p_size") % 4 + 2))
      .select(
        col("p_partkey"),
        expr("array_join(transform(words, w -> upper(w)), '|')")
          .as("upper_words"),
        expr("array_join(filter(words, w -> length(w) > 4), '|')")
          .as("long_words"),
        expr("aggregate(words, 0, (a, w) -> a + length(w))").as("total_len"),
        expr("exists(words, w -> length(w) > 5)").as("any_long"),
        expr("forall(words, w -> length(w) < 12)").as("all_short"),
        expr("array_join(cast(zip_with(nums, reverse(nums), " +
          "(a, b) -> a + b) as array<string>), '|')").as("zip_sum"))
      .orderBy(col("p_partkey"))

  private val arrHofSql =
    """WITH t AS (
      |  SELECT p_partkey, string_split(p_name, ' ') AS words,
      |    list_transform(range(1, p_size % 4 + 3), x -> CAST(x AS INTEGER)) AS nums
      |  FROM part WHERE p_partkey % 13 = 0)
      |SELECT p_partkey,
      |  array_to_string(list_transform(words, w -> upper(w)), '|') AS upper_words,
      |  COALESCE(array_to_string(list_filter(words, w -> length(w) > 4), '|'), '') AS long_words,
      |  list_reduce(list_prepend(CAST(0 AS INTEGER),
      |    list_transform(words, w -> CAST(length(w) AS INTEGER))),
      |    (a, b) -> a + b) AS total_len,
      |  len(list_filter(words, w -> length(w) > 5)) > 0 AS any_long,
      |  len(list_filter(words, w -> length(w) >= 12)) = 0 AS all_short,
      |  array_to_string(list_transform(range(1, len(nums) + 1),
      |    i -> nums[i] + nums[len(nums) + 1 - i]), '|') AS zip_sum
      |FROM t ORDER BY p_partkey""".stripMargin

  // F_MAP1 — map construction and access (scalars + sorted keys out;
  // raw MAP values never emitted — cross-engine map encoding differs).
  private def mapBasic(s: SparkSession, d: String): DataFrame = {
    val m = map(lit("brand"), col("p_brand"), lit("type"), col("p_type"))
    Tables.part(s, d)
      .filter(col("p_partkey") % 13 === 0)
      .select(
        col("p_partkey"),
        element_at(m, "brand").as("brand_v"),
        element_at(m, "type").as("type_v"),
        size(m).as("n_keys"),
        array_join(array_sort(map_keys(m)), "|").as("keys_sorted"))
      .orderBy(col("p_partkey"))
  }

  private val mapBasicSql =
    """WITH t AS (SELECT p_partkey,
      |    MAP {'brand': p_brand, 'type': p_type} AS m
      |  FROM part WHERE p_partkey % 13 = 0)
      |SELECT p_partkey,
      |  map_extract(m, 'brand')[1] AS brand_v,
      |  map_extract(m, 'type')[1] AS type_v,
      |  CAST(cardinality(m) AS INTEGER) AS n_keys,
      |  array_to_string(list_sort(map_keys(m)), '|') AS keys_sorted
      |FROM t ORDER BY p_partkey""".stripMargin

  // F_MAP2 — map higher-order functions: transform_values, map_filter,
  // map_zip_with (the MapType side of the HOF matrix). Results emitted
  // as sorted k=v strings; the oracle reconstructs them directly
  // (keys 'retail' < 'size' sort stably).
  private def mapHof(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_partkey") % 40 === 0)
      .withColumn("m", map(lit("retail"), col("p_retailprice"),
        lit("size"), col("p_size").cast("double")))
      .withColumn("m2", map(lit("retail"), lit(2.0), lit("size"), lit(3.0)))
      .select(
        col("p_partkey"),
        expr("array_join(transform(array_sort(map_entries(" +
          "transform_values(m, (k, v) -> round(v * 2, 2)))), " +
          "e -> concat(e.key, '=', cast(e.value as string))), '|')")
          .as("doubled"),
        expr("array_join(transform(array_sort(map_entries(" +
          "map_filter(m, (k, v) -> v > 20))), " +
          "e -> concat(e.key, '=', cast(e.value as string))), '|')")
          .as("big_only"),
        expr("array_join(transform(array_sort(map_entries(" +
          "map_zip_with(m, m2, (k, v1, v2) -> round(v1 * v2, 2)))), " +
          "e -> concat(e.key, '=', cast(e.value as string))), '|')")
          .as("zipped"))
      .orderBy(col("p_partkey"))

  private val mapHofSql =
    """SELECT p_partkey,
      |  'retail=' || CAST(ROUND(p_retailprice * 2, 2) AS VARCHAR) ||
      |    '|size=' || CAST(ROUND(CAST(p_size AS DOUBLE) * 2, 2) AS VARCHAR)
      |    AS doubled,
      |  'retail=' || CAST(p_retailprice AS VARCHAR) ||
      |    CASE WHEN p_size > 20
      |      THEN '|size=' || CAST(CAST(p_size AS DOUBLE) AS VARCHAR)
      |      ELSE '' END AS big_only,
      |  'retail=' || CAST(ROUND(p_retailprice * 2.0, 2) AS VARCHAR) ||
      |    '|size=' || CAST(ROUND(CAST(p_size AS DOUBLE) * 3.0, 2) AS VARCHAR)
      |    AS zipped
      |FROM part WHERE p_partkey % 40 = 0 ORDER BY p_partkey""".stripMargin

  // F_COND1 — if / nvl / nullif / isnull (CASE covered by Q_FILT2).
  private def condBasic(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") % 20 === 0)
      .select(
        col("o_orderkey"),
        expr("if(o_totalprice > 100000, 'hi', 'lo')").as("hilo"),
        expr("nvl(nullif(o_orderstatus, 'O'), 'open')").as("status2"),
        expr("isnull(nullif(o_orderstatus, 'F'))").as("was_f"))
      .orderBy(col("o_orderkey"))

  private val condBasicSql =
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice > 100000 THEN 'hi' ELSE 'lo' END AS hilo,
      |  COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status2,
      |  NULLIF(o_orderstatus, 'F') IS NULL AS was_f
      |FROM orders WHERE o_orderkey % 20 = 0 ORDER BY o_orderkey""".stripMargin

  // F_HASH1 — cross-engine-stable digests only (md5 / sha2-256;
  // hash/xxhash64/murmur are engine-specific seeds — excluded, §7.4).
  private def hashDigest(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .filter(col("c_custkey") % 11 === 0)
      .select(
        col("c_custkey"),
        md5(col("c_name").cast("binary")).as("md5_name"),
        sha2(col("c_name").cast("binary"), 256).as("sha256_name"))
      .orderBy(col("c_custkey"))

  private val hashDigestSql =
    """SELECT c_custkey, md5(c_name) AS md5_name, sha256(c_name) AS sha256_name
      |FROM customer WHERE c_custkey % 11 = 0 ORDER BY c_custkey""".stripMargin

  // F_CAST1 — the safe cross-engine cast matrix (double→string and
  // double→int are excluded by design: formatting / rounding-direction
  // differences between engines).
  private def castMatrix(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") % 20 === 0)
      .select(
        col("o_orderkey"),
        col("o_orderkey").cast("string").as("key_str"),
        lit("42").cast("int").as("i42"),
        col("o_orderkey").cast("double").as("key_dbl"),
        col("o_orderdate").cast("date").as("dt"),
        col("o_orderdate").cast("date").cast("string").as("dt_str"),
        (col("o_totalprice") > 100000.0).cast("int").as("big_flag"),
        lit("2024-01-01 12:30:00").cast("timestamp").as("ts_lit"),
        lit("3.5").cast("double").as("d35"))
      .orderBy(col("o_orderkey"))

  private val castMatrixSql =
    """SELECT o_orderkey,
      |  CAST(o_orderkey AS VARCHAR) AS key_str,
      |  CAST('42' AS INTEGER) AS i42,
      |  CAST(o_orderkey AS DOUBLE) AS key_dbl,
      |  CAST(o_orderdate AS DATE) AS dt,
      |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS dt_str,
      |  CAST(o_totalprice > 100000.0 AS INTEGER) AS big_flag,
      |  CAST('2024-01-01 12:30:00' AS TIMESTAMP) AS ts_lit,
      |  CAST('3.5' AS DOUBLE) AS d35
      |FROM orders WHERE o_orderkey % 20 = 0 ORDER BY o_orderkey""".stripMargin

  // Q_GEN1 — LATERAL VIEW explode equivalent.
  private def genExplode(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_partkey") % 13 === 0)
      .select(col("p_partkey"),
        explode(split(col("p_name"), " ")).as("word"))
      .orderBy(col("p_partkey"), col("word"))

  private val genExplodeSql =
    """SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
      |FROM part WHERE p_partkey % 13 = 0
      |ORDER BY p_partkey, word""".stripMargin

  // Q_GEN2 — posexplode (0-based position; DuckDB subscripts are
  // 1-based → -1).
  private def genPosExplode(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_partkey") % 13 === 0)
      .select(col("p_partkey"),
        posexplode(split(col("p_name"), " ")).as(Seq("pos", "word")))
      .orderBy(col("p_partkey"), col("pos"))

  private val genPosExplodeSql =
    """SELECT p_partkey,
      |  CAST(generate_subscripts(string_split(p_name, ' '), 1) - 1 AS INTEGER) AS pos,
      |  unnest(string_split(p_name, ' ')) AS word
      |FROM part WHERE p_partkey % 13 = 0
      |ORDER BY p_partkey, pos""".stripMargin

  // Q_GEN3 — JSON extraction over events.props.
  private def genJson(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("user_id") % 25 === 0)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("int").as("k_int"),
        get_json_object(col("props"), "$.missing").as("absent"))
      .orderBy(col("event_id"))

  private val genJsonSql =
    """SELECT event_id,
      |  json_extract_string(props, '$.k') AS k_str,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
      |  json_extract_string(props, '$.missing') AS absent
      |FROM events WHERE user_id % 25 = 0 ORDER BY event_id""".stripMargin

  // F_STR4 — edit distance (fuzzy-match primitive behind near-dup
  // candidate verification on short strings). Same Levenshtein
  // definition in both engines.
  private def strEditDist(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_partkey") % 50 === 0)
      .select(col("p_partkey"),
        levenshtein(col("p_brand"), col("p_type")).as("lev_bt"),
        levenshtein(col("p_name"), col("p_type")).as("lev_nt"),
        levenshtein(lit("standard"), col("p_type")).as("lev_std"))
      .orderBy(col("p_partkey"))

  private val strEditDistSql =
    """SELECT p_partkey,
      |  CAST(levenshtein(p_brand, p_type) AS INTEGER) AS lev_bt,
      |  CAST(levenshtein(p_name, p_type) AS INTEGER) AS lev_nt,
      |  CAST(levenshtein('standard', p_type) AS INTEGER) AS lev_std
      |FROM part WHERE p_partkey % 50 = 0 ORDER BY p_partkey""".stripMargin

  def all: Seq[GQuery] = Seq(
    GQuery("F_STR1_basic", strBasic, Some(strBasicSql)),
    GQuery("F_STR2_regex", strRegex, Some(strRegexSql)),
    GQuery("F_STR4_editdist", strEditDist, Some(strEditDistSql)),
    GQuery("F_DATE1_parts", dateParts, Some(datePartsSql)),
    GQuery("F_DATE2_arith", dateArith, Some(dateArithSql)),
    GQuery("F_DATE3_epoch", dateEpoch, Some(dateEpochSql)),
    GQuery("F_MATH1_scalar", mathScalar, Some(mathScalarSql)),
    GQuery("F_ARR1_basic", arrBasic, Some(arrBasicSql)),
    GQuery("F_ARR2_hof", arrHof, Some(arrHofSql)),
    GQuery("F_MAP2_hof", mapHof, Some(mapHofSql)),
    GQuery("F_MAP1_basic", mapBasic, Some(mapBasicSql)),
    GQuery("F_COND1_basic", condBasic, Some(condBasicSql)),
    GQuery("F_HASH1_digest", hashDigest, Some(hashDigestSql)),
    GQuery("F_CAST1_matrix", castMatrix, Some(castMatrixSql)),
    GQuery("Q_GEN1_explode", genExplode, Some(genExplodeSql)),
    GQuery("Q_GEN2_posexplode", genPosExplode, Some(genPosExplodeSql)),
    GQuery("Q_GEN3_json", genJson, Some(genJsonSql)))
}
