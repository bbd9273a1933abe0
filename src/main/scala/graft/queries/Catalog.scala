package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.{Dictionaries, EnumDomains, RankingProfile, RankingWeights}
import graft.functions.{text => T, vectors => V}
import graft.sources.Tables

/** One catalog entry: a Spark query + (optionally) its DuckDB oracle SQL. */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/**
 * Every operator from SURVEY.md §2 as a named query over the driver's
 * testdata, paired with DuckDB oracle SQL built from the SAME Scala
 * constants (no dictionary/weight drift possible).
 *
 * Cross-engine determinism rules (SURVEY.md §6):
 *  - aggregates of doubles go through DECIMAL casts (exact, order-free);
 *  - row-level double math is IEEE-identical in both engines;
 *  - only md5 is used for hashing (identical hex in both engines);
 *  - every computed column is aliased identically on both sides;
 *  - top-N/window queries break ties on a key column.
 */
object Catalog {

  /** decimal type used to make double aggregation order-independent. */
  private val DecM = "decimal(12,4)" // money/qty columns (< 1e8, 2dp)
  private val DecV = "decimal(18,6)" // event values

  // ---------------------------------------------------------------- a1
  private val a1 = Q(
    "a1_agg_pushdown",
    (s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast(DecM)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(DecM)).cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast(DecM) *
            (lit(1).cast(DecM) - col("l_discount").cast(DecM))).cast("double").as("sum_disc_price"),
          (sum(col("l_discount").cast(DecM)).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },
    Some(s"""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) *
             (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus"""))

  // ---------------------------------------------------------------- a2
  private val a2 = Q(
    "a2_star_join",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
      val c = Tables.customer(s, d)
      val su = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      // dims broadcast: only the fact side (lineitem/orders) ever shuffles.
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(su),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(
          sum(col("l_extendedprice").cast(DecM) *
            (lit(1).cast(DecM) - col("l_discount").cast(DecM))).cast("double").as("revenue"),
          count(lit(1)).as("n_lineitems"))
    },
    Some(s"""
      SELECT n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) *
             (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_lineitems
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name"""))

  // ---------------------------------------------------------------- a3
  private val a3 = Q(
    "a3_window_rank",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val w = Window.partitionBy("n_name").orderBy(col("c_acctbal").desc, col("c_custkey"))
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select("n_name", "c_custkey", "c_acctbal", "rnk")
    },
    Some("""
      SELECT n_name, c_custkey, c_acctbal, rnk FROM (
        SELECT n_name, c_custkey, c_acctbal,
          ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rnk
        FROM customer JOIN nation ON c_nationkey = n_nationkey) t
      WHERE rnk <= 3"""))

  // ---------------------------------------------------------------- a4
  private val a4 = Q(
    "a4_event_window",
    (s, d) => {
      Tables.events(s, d)
        .groupBy(
          date_trunc("hour", col("ts")).cast("string").as("window_start"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast(DecV)).cast("double").as("total_value"))
    },
    Some("""
      SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start, event_type,
        COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      FROM events
      GROUP BY 1, 2"""))

  // ---------------------------------------------------------------- n1
  private val n1 = Q(
    "n1_normalize_ws",
    (s, d) => {
      val c = Tables.customer(s, d)
      c.select(
        col("c_custkey"),
        T.normKey(concat(lit("  "), col("c_name"), lit("   "), col("c_mktsegment"), lit(" ")))
          .as("name_norm"))
    },
    Some("""
      SELECT c_custkey,
        lower(regexp_replace(trim(concat('  ', c_name, '   ', c_mktsegment, ' ')), '\s+', ' ', 'g')) AS name_norm
      FROM customer"""))

  // ---------------------------------------------------------------- n2
  private val n2 = Q(
    "n2_hash_key",
    (s, d) => {
      val c = Tables.customer(s, d)
      c.select(
        col("c_custkey"),
        T.hashKey(col("c_name"), col("c_mktsegment"), col("c_nationkey").cast("string"))
          .as("hash_key"))
    },
    Some("""
      SELECT c_custkey,
        md5(concat_ws('|',
          lower(regexp_replace(trim(c_name), '\s+', ' ', 'g')),
          lower(regexp_replace(trim(c_mktsegment), '\s+', ' ', 'g')),
          lower(regexp_replace(trim(CAST(c_nationkey AS VARCHAR)), '\s+', ' ', 'g')))) AS hash_key
      FROM customer"""))

  // ---------------------------------------------------------------- n3
  private val n3 = {
    val valid = EnumDomains.validEventTypes
    val validSql = valid.map(v => s"'$v'").mkString(", ")
    Q(
      "n3_enum_normalize",
      (s, d) => {
        Tables.events(s, d).select(
          col("event_id"),
          T.normalizeEnum(col("event_type"), valid, EnumDomains.defaultEnum).as("event_type_norm"))
      },
      Some(s"""
        SELECT event_id,
          CASE WHEN lower(trim(event_type)) IN ($validSql)
               THEN lower(trim(event_type)) ELSE '${EnumDomains.defaultEnum}' END AS event_type_norm
        FROM events"""))
  }

  // ---------------------------------------------------------------- n4
  private val n4 = Q(
    "n4_safe_cast",
    (s, d) => {
      Tables.events(s, d).select(
        col("event_id"),
        T.safeLong(regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1)).as("k_val"),
        T.safeDouble(col("event_type")).as("bad_double"))
    },
    Some("""
      SELECT event_id,
        TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k_val,
        TRY_CAST(event_type AS DOUBLE) AS bad_double
      FROM events"""))

  // ---------------------------------------------------------------- n5
  private val n5 = Q(
    "n5_range_repair",
    (s, d) => {
      Tables.lineitem(s, d).select(
        col("l_orderkey"),
        col("l_linenumber"),
        least(col("l_discount"), col("l_tax")).as("range_lo"),
        greatest(col("l_discount"), col("l_tax")).as("range_hi"))
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
        least(l_discount, l_tax) AS range_lo,
        greatest(l_discount, l_tax) AS range_hi
      FROM lineitem"""))

  // ---------------------------------------------------------------- n6
  private val n6 = Q(
    "n6_timestamp_parse",
    (s, d) => {
      val iso = date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")
      Tables.events(s, d).select(
        col("event_id"),
        iso.as("iso_ts"),
        unix_timestamp(to_timestamp(iso)).as("epoch_s"))
    },
    Some("""
      SELECT event_id,
        strftime(ts, '%Y-%m-%d %H:%M:%S') AS iso_ts,
        CAST(epoch(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S')) AS BIGINT) AS epoch_s
      FROM events"""))

  // ---------------------------------------------------------------- d1
  private val d1 = Q(
    "d1_dedup_exact",
    (s, d) => {
      // union the table with itself so the collapse is visible (n_dups = 2)
      val docs = Tables.documents(s, d)
      docs.unionAll(docs)
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(min(col("doc_id")).as("survivor_id"), count(lit(1)).as("n_dups"))
    },
    Some("""
      SELECT md5(text) AS text_hash, min(doc_id) AS survivor_id, COUNT(*) AS n_dups
      FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents) t
      GROUP BY 1"""))

  /** All registered queries, in SURVEY §2 order. */
  val all: Seq[Q] = Seq(a1, a2, a3, a4, n1, n2, n3, n4, n5, n6, d1)

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
