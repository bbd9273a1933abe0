package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{text => T}

/**
 * Enrichment operators, re-expressing the reference's enricher service:
 *
 *  - [[extractSkills]]: services/enricher/skills_extractor.py — dictionary
 *    alias→canonical extraction over free text, including multi-word
 *    phrase aliases (the spaCy PhraseMatcher path) via token bigrams.
 *  - [[classifyByRules]]: services/common/seniority_extractor.py — ordered
 *    word-boundary regex keyword rules, first hit wins.
 *  - [[fuzzyJoin]]: services/enricher/company_matcher.py — fuzzy name
 *    matching, done scalably as a *blocked* similarity join (never a cross
 *    join): equality on a cheap blocking key, edit-distance only inside
 *    blocks.
 *
 * Scale notes: extractSkills is explode + broadcast-join + one groupBy on
 * the doc id (a single shuffle, map-side combinable); classifyByRules is a
 * pure row-level expression; fuzzyJoin's cost is Σ block² — the blocking
 * key caps it at any corpus size (SURVEY.md §5).
 */
object Enrich {

  /**
   * Dictionary skills extraction. `dict` maps alias → canonical; aliases
   * of 1 or 2 words are matched against text tokens and token bigrams.
   * Returns (idCol, skills_csv): the sorted distinct canonical skills,
   * comma-joined (portable across engines and hash-stable).
   */
  def extractSkills(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, dict: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val dictDf = broadcast(dict.toDF("alias", "canonical"))
    val w = T.words(col(textCol))
    val bigrams = T.wordShingles(w, 2)
    Par.ensure(docs).select(col(idCol), explode(concat(w, bigrams)).as("gram"))
      .join(dictDf, col("gram") === col("alias"))
      .groupBy(idCol)
      .agg(array_join(array_sort(collect_set(col("canonical"))), ",").as("skills_csv"))
  }

  /** Ordered (pattern → label) regex rules; first match wins, else default. */
  def classifyByRules(textCol: Column, rules: Seq[(String, String)],
      default: String): Column =
    rules.foldRight(lit(default): Column) { case ((pattern, label), elseCol) =>
      when(lower(textCol).rlike(pattern), lit(label)).otherwise(elseCol)
    }

  /**
   * Blocked fuzzy self/cross join: candidates share `blockKey` (equality →
   * plain shuffle join), then `levenshtein(leftName, rightName) <= maxDist`
   * is evaluated only inside blocks.
   */
  def fuzzyJoin(left: DataFrame, right: DataFrame, leftName: Column,
      rightName: Column, blockLeft: Column, blockRight: Column,
      maxDist: Int): DataFrame =
    left.join(right, blockLeft === blockRight)
      .withColumn("edit_dist", levenshtein(leftName, rightName))
      .filter(col("edit_dist") <= maxDist)
}
