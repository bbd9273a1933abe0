package graft.config

/**
 * Engine configuration, mirroring the reference's YAML configs as plain
 * case classes (reference: config/ranking.yml, the config/taxonomy YAMLs,
 * services/normalizer/normalize.py:25 enum domains).
 *
 * The same constants are used to build BOTH the Spark plans and the DuckDB
 * oracle SQL (graft.queries.Catalog), so dictionaries/weights can never
 * drift between engine and oracle.
 */
object EnumDomains {
  /** normalize.py:25 VALID_REMOTE_TYPES analog for the events table. */
  val validEventTypes: Seq[String] = Seq("click", "view", "purchase", "signup")
  val defaultEnum: String = "unknown"
}

/** Ranking weights — 8 features, summing to 1.0 (reference:
  * config/ranking.yml `weights`; scoring.py scores 8 features). */
final case class RankingWeights(
    titleKeywords: Double = 0.20,
    skillsOverlap: Double = 0.25,
    priceBand: Double = 0.125,
    brandMatch: Double = 0.075,
    typeMatch: Double = 0.075,
    sizeBand: Double = 0.075,
    classMatch: Double = 0.10,
    proximity: Double = 0.10)

/**
 * Ranking profile over the `part` table (reference: config/ranking.yml
 * `profile` — title keywords, salary band, preferred enums, seniority
 * preference, location — re-keyed to the testdata's part attributes).
 */
final case class RankingProfile(
    titleKeywords: Seq[String] = Seq("red", "blue", "small", "gear", "widget"),
    mustHaveSkills: Seq[String] = Seq("bolt"),
    niceToHaveSkills: Seq[String] = Seq("ring", "gizmo", "gear"),
    priceMin: Double = 900.0,
    priceMax: Double = 1600.0,
    preferredBrands: Seq[String] = Seq("Brand#1", "Brand#2", "Brand#3"),
    preferredTypes: Seq[String] = Seq("ECONOMY", "STANDARD"),
    sizeMin: Int = 5,
    sizeMax: Int = 30,
    /** seniority-chain analog (scoring.py:238): ordered regex rules
      * classify the name, and the CLASS is scored below. */
    classRules: Seq[(String, String)] = Seq(
      "\\bbolt\\b" -> "fastener",
      "\\b(ring|gear)\\b" -> "mechanical",
      "\\b(widget|gizmo)\\b" -> "gadget"),
    classScores: Seq[(String, Double)] = Seq(
      "fastener" -> 1.0, "mechanical" -> 0.6, "gadget" -> 0.4),
    /** location-proximity analog (scoring.py:102): distance of the brand
      * number from "home", mapped through tiers (city/country/region). */
    homeBrand: Int = 5,
    proximityTiers: Seq[(Int, Double)] = Seq(0 -> 1.0, 2 -> 0.8, 5 -> 0.6))

object Dictionaries {
  /**
   * Skills dictionary: alias -> canonical (reference:
   * config/taxonomy/skills_dictionary.yml), re-keyed to the vocabulary the
   * synthetic documents actually contain. Multi-word aliases exercise the
   * phrase-match path (skills_extractor.py PhraseMatcher).
   */
  val skills: Seq[(String, String)] = Seq(
    "join" -> "join",
    "merge" -> "join",
    "hash join" -> "join",
    "agg" -> "aggregation",
    "group" -> "aggregation",
    "window" -> "windowing",
    "stream" -> "streaming",
    "batch" -> "batch",
    "scan" -> "scan",
    "table scan" -> "scan",
    // 3-word alias: exercises the any-length PhraseMatcher path
    "fast table scan" -> "fullscan",
    "sort" -> "sort",
    "order" -> "sort",
    "filter" -> "filter",
    "spark" -> "spark",
    "query" -> "sql",
    "vector" -> "vector")

  /** Stopword list used by quality scoring + language ID. */
  val stopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /**
   * Language marker words (n-gram heuristic stand-in; the container has no
   * langid model — reference pipelines would plug fastText here).
   */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow"),
    "de" -> Seq("der", "und", "nicht"),
    "fr" -> Seq("le", "la", "et"),
    "es" -> Seq("el", "los", "que"),
    "zh" -> Seq("de", "shi", "bu"))
}

/**
 * Runtime tuning knobs read from the Spark conf — the hooks that change
 * between local[32] and a 1000-executor cluster (SURVEY §5).
 */
object Knobs {
  /**
   * Exchange width for shuffles that FEED Generate-amplified stages (the
   * deletion-neighborhood explode, the LSH band table, candidate-pair
   * verification): these exchanges carry few BYTES but fan out to orders
   * of magnitude more work ABOVE them, so the engine always gives them an
   * EXPLICIT partition count — AQE's coalescing is byte-based, cannot see
   * the amplification, and measurably serializes the amplified stage onto
   * one task (BENCH_NOTES, the e4 case: 93 s single-task vs ~3 s spread).
   *
   * Default: `spark.sql.shuffle.partitions` — right when the post-explode
   * row count per partition still fits a task (always true at fixture
   * scale). On a cluster, set `spark.graft.amplifiedShufflePartitions`
   * to scale the width with the POST-explode row count instead (rows ×
   * amplification / target-rows-per-task), independently of the global
   * shuffle width the un-amplified exchanges should keep.
   */
  def amplifiedShufflePartitions(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.getOption("spark.graft.amplifiedShufflePartitions").map(_.toInt)
      .getOrElse(spark.sessionState.conf.numShufflePartitions)
}
