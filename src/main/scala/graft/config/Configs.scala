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

/** Ranking weights (reference: config/ranking.yml `weights`). */
final case class RankingWeights(
    titleKeywords: Double = 0.25,
    skillsOverlap: Double = 0.30,
    priceBand: Double = 0.15,
    brandMatch: Double = 0.10,
    typeMatch: Double = 0.10,
    sizeBand: Double = 0.10)

/**
 * Ranking profile over the `part` table (reference: config/ranking.yml
 * `profile` — title keywords, salary band, preferred enums — re-keyed to
 * the testdata's part attributes).
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
    sizeMax: Int = 30)

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
