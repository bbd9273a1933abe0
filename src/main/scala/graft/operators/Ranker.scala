package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.config.{RankingProfile, RankingWeights}

/**
 * Configurable weighted ranking with per-feature explainability,
 * re-expressing the reference's ranker (services/ranker/scoring.py:290
 * calculate_rank): N per-feature scores in [0,1], a weighted sum scaled to
 * 0–100 (clamped, 2dp), and the per-feature subscores kept as explain
 * columns.
 *
 * Every score is a row-level Column expression — fully codegen'd, zero
 * shuffle, embarrassingly parallel at any scale.
 */
object Ranker {

  /** Substring keyword-coverage score (scoring.py:16 calculate_title_score). */
  def keywordScore(title: Column, keywords: Seq[String]): Column = {
    val hits = keywords.map(k => when(lower(title).contains(k), 1).otherwise(0))
    hits.reduce(_ + _).cast("double") / keywords.size.toDouble
  }

  /**
   * Skills-overlap score (scoring.py:50 calculate_skills_score): missing
   * any must-have → 0.1; no nice-to-haves configured → 0.8; otherwise
   * 0.5 + 0.5 * nice-to-have coverage.
   */
  def skillsScore(tokens: Column, mustHave: Seq[String], niceToHave: Seq[String]): Column = {
    val allMust = mustHave.map(m => array_contains(tokens, m))
      .reduceOption(_ && _).getOrElse(lit(true))
    val niceScore =
      if (niceToHave.isEmpty) lit(0.8)
      else {
        val hits = niceToHave.map(n => when(array_contains(tokens, n), 1).otherwise(0))
          .reduce(_ + _)
        lit(0.5) + lit(0.5) * hits.cast("double") / niceToHave.size.toDouble
      }
    when(!allMust, 0.1).otherwise(niceScore)
  }

  /**
   * Band score with linear taper outside the target band
   * (scoring.py:134 calculate_salary_score): inside → 1.0, outside →
   * max(0.1, 1 - distance/bandwidth).
   */
  def bandScore(value: Column, lo: Double, hi: Double): Column = {
    val range = hi - lo
    val below = greatest(lit(0.1), lit(1.0) - least((lit(lo) - value) / range, lit(1.0)))
    val above = greatest(lit(0.1), lit(1.0) - least((value - lit(hi)) / range, lit(1.0)))
    when(value.isNull, 0.5)
      .when(value >= lo && value <= hi, 1.0)
      .when(value < lo, below)
      .otherwise(above)
  }

  /** Preference score: in preferred set → 1.0, else `penalty`
    * (scoring.py:218 calculate_contract_score / 267 company_size_score). */
  def preferenceScore(value: Column, preferred: Seq[String], penalty: Double): Column =
    when(value.isin(preferred: _*), 1.0).otherwise(lit(penalty))

  /** Numeric-range preference (size band): inside → 1.0, else 0.7. */
  def rangePreference(value: Column, lo: Int, hi: Int): Column =
    when(value >= lo && value <= hi, 1.0).otherwise(lit(0.7))

  /**
   * Classifier-chain score (scoring.py:238 calculate_seniority_score): the
   * enrichment classifier (Enrich.classifyByRules — the e2 operator) is
   * applied to the text and its CLASS, not the raw text, is scored against
   * a per-class preference map — ranking consumes the enriched attribute
   * exactly as the reference ranks the extracted seniority.
   */
  def classScore(textCol: Column, rules: Seq[(String, String)],
      classScores: Seq[(String, Double)], default: Double): Column = {
    val cls = Enrich.classifyByRules(textCol, rules, "unknown")
    classScores.foldRight(lit(default): Column) { case ((label, s), elseCol) =>
      when(cls === label, lit(s)).otherwise(elseCol)
    }
  }

  /**
   * Tiered proximity score (scoring.py:102 calculate_location_score: same
   * city 1.0 / same country 0.7 / remote-ok 0.5 / far 0.2): distance from
   * a "home" value mapped through ordered (maxDistance → score) tiers.
   */
  def proximityScore(value: Column, home: Int, tiers: Seq[(Int, Double)],
      far: Double): Column = {
    val d = abs(value - lit(home))
    tiers.foldRight(lit(far): Column) { case ((maxD, s), elseCol) =>
      when(d <= maxD, lit(s)).otherwise(elseCol)
    }
  }

  /**
   * Rank the `part` table against a profile: 8 per-feature scores in [0,1]
   * kept as explain columns, weighted sum scaled to 0-100, clamped, 2dp
   * (scoring.py:290 calculate_rank / :353 weighted sum).
   */
  def rankParts(parts: DataFrame, w: RankingWeights, p: RankingProfile): DataFrame = {
    val tokens = split(lower(col("p_name")), " ")
    // 'Brand#NN' → NN: the numeric "distance" axis for the proximity tier
    val brandNum = substring(col("p_brand"), 7, 10).cast("int")
    val scored = parts.select(
      col("p_partkey"),
      keywordScore(col("p_name"), p.titleKeywords).as("title_score"),
      skillsScore(tokens, p.mustHaveSkills, p.niceToHaveSkills).as("skills_score"),
      bandScore(col("p_retailprice"), p.priceMin, p.priceMax).as("price_score"),
      preferenceScore(col("p_brand"), p.preferredBrands, 0.3).as("brand_score"),
      preferenceScore(col("p_type"), p.preferredTypes, 0.3).as("type_score"),
      rangePreference(col("p_size"), p.sizeMin, p.sizeMax).as("size_score"),
      classScore(col("p_name"), p.classRules, p.classScores, 0.3).as("class_score"),
      proximityScore(brandNum, p.homeBrand, p.proximityTiers, 0.2).as("proximity_score"))
    val weighted =
      col("title_score") * w.titleKeywords +
      col("skills_score") * w.skillsOverlap +
      col("price_score") * w.priceBand +
      col("brand_score") * w.brandMatch +
      col("type_score") * w.typeMatch +
      col("size_score") * w.sizeBand +
      col("class_score") * w.classMatch +
      col("proximity_score") * w.proximity
    scored.withColumn("rank_score",
      least(greatest(round(weighted * 100, 2), lit(0.0)), lit(100.0)))
  }
}
