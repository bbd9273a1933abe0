package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{text => T}

/**
 * Enrichment operators, re-expressing the reference's enricher service:
 *
 *  - [[extractSkills]]: services/enricher/skills_extractor.py — dictionary
 *    alias→canonical extraction over free text. The spaCy PhraseMatcher
 *    path matches phrases of ANY length, so token n-grams are generated up
 *    to the longest alias in the dictionary (not just bigrams).
 *  - [[classifyByRules]]: services/common/seniority_extractor.py — ordered
 *    word-boundary regex keyword rules, first hit wins.
 *  - [[fuzzyJoin]]: services/enricher/company_matcher.py — fuzzy name
 *    matching accepted by NORMALIZED similarity ratio (fuzz.ratio >= 80,
 *    company_matcher.py:139), done scalably as a *blocked* similarity join
 *    (never a cross join): equality on a blocking key, edit distance only
 *    inside blocks.
 *  - [[editBlockKeys]]: deletion-neighborhood blocking for edit distance
 *    <= 1 — a string and all its 1-character-deletion variants. Any two
 *    strings within levenshtein 1 share at least one key, so the blocking
 *    is EXACT (100% recall), and key cardinality grows with the data
 *    (unlike a fixed suffix/prefix key, which goes quadratic at scale).
 *
 * Scale notes: extractSkills is explode + broadcast-join + one groupBy on
 * the doc id (a single shuffle, map-side combinable); classifyByRules is a
 * pure row-level expression; fuzzyJoin's cost is Σ block².
 */
object Enrich {

  /**
   * Dictionary skills extraction. `dict` maps alias → canonical; aliases
   * are matched against token n-grams of every length up to the longest
   * alias (skills_extractor.py:215 PhraseMatcher semantics). Returns
   * (idCol, skills_csv): sorted distinct canonical skills, comma-joined
   * (portable across engines and hash-stable).
   */
  def extractSkills(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, dict: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val maxN = dict.map(_._1.split(" ").length).max
    val dictDf = broadcast(dict.toDF("alias", "canonical"))
    // One posexplode (tokenization runs once per doc), n-grams as window
    // `lead`s over the token position — plain codegen'd expressions, one
    // shuffle on the doc id which the final groupBy reuses. (Building
    // n-gram arrays with higher-order lambdas over an inline split would
    // re-evaluate the split per element — a quadratic trap.)
    val toks = docs.select(col(idCol), posexplode(T.words(col(textCol))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(idCol).orderBy("pos")
    val gramCols = (1 to maxN).map { n =>
      val c =
        if (n == 1) col("tok")
        else {
          val parts = col("tok") +: (1 until n).map(j => lead("tok", j).over(w))
          when(parts.last.isNotNull, concat_ws(" ", parts: _*)) // null = no n-gram here
        }
      c.as(s"g$n")
    }
    // window expressions need their own projection before the explode
    toks.select(col(idCol) +: gramCols: _*)
      .select(col(idCol), explode(array((1 to maxN).map(n => col(s"g$n")): _*)).as("gram"))
      .join(dictDf, col("gram") === col("alias")) // null grams never match
      .groupBy(idCol)
      .agg(array_join(array_sort(collect_set(col("canonical"))), ",").as("skills_csv"))
  }

  /** Ordered (pattern → label) regex rules; first match wins, else default. */
  def classifyByRules(textCol: Column, rules: Seq[(String, String)],
      default: String): Column =
    rules.foldRight(lit(default): Column) { case ((pattern, label), elseCol) =>
      when(lower(textCol).rlike(pattern), lit(label)).otherwise(elseCol)
    }

  /** Length-normalized similarity ratio in [0,100], 2dp — the engine-side
    * analog of fuzz.ratio (company_matcher.py:19 threshold 80): a 1-edit
    * difference means much more for a 5-char name than a 50-char one. */
  def similarityRatio(a: Column, b: Column): Column =
    round(lit(100.0) * (lit(1.0) -
      levenshtein(a, b).cast("double") /
        greatest(length(a), length(b)).cast("double")), 2)

  /**
   * Deletion-neighborhood blocking keys: the string itself plus every
   * 1-character-deletion variant. For any pair with levenshtein <= 1
   * (substitution, insertion, or deletion) the key sets intersect, so a
   * join on the exploded keys finds EVERY such pair — no recall loss —
   * while block sizes stay tiny and block cardinality grows with n.
   */
  def editBlockKeys(name: Column): Column =
    when(length(name) === 0, array(name)).otherwise(
      array_union(
        array(name),
        transform(sequence(lit(1), length(name)), i =>
          concat(name.substr(lit(1), i - 1), name.substr(i + 1, length(name) - i)))))

  /**
   * Blocked fuzzy join: candidates share `blockKey` (equality → plain
   * shuffle join); `edit_dist` and `sim_ratio` are evaluated only inside
   * blocks, and matches are accepted by normalized ratio (reference
   * semantics) AND edit distance.
   */
  def fuzzyJoin(left: DataFrame, right: DataFrame, leftName: Column,
      rightName: Column, blockLeft: Column, blockRight: Column,
      maxDist: Int, minRatio: Double): DataFrame =
    left.join(right, blockLeft === blockRight)
      .withColumn("edit_dist", levenshtein(leftName, rightName))
      .withColumn("sim_ratio", similarityRatio(leftName, rightName))
      .filter(col("edit_dist") <= maxDist && col("sim_ratio") >= minRatio)

  /**
   * Fuzzy self-match with exact-recall deletion-neighborhood blocking
   * (maxDist fixed at 1 — the neighborhood scheme's guarantee). Emits each
   * qualifying (id1 < id2) pair once with edit_dist and sim_ratio.
   */
  def fuzzySelfMatch(names: DataFrame, idCol: String, nameCol: String,
      minRatio: Double): DataFrame = {
    val a = names.select(col(idCol).as("id1"), col(nameCol).as("name1"),
      explode(editBlockKeys(col(nameCol))).as("bk"))
    val b = names.select(col(idCol).as("id2"), col(nameCol).as("name2"),
      explode(editBlockKeys(col(nameCol))).as("bk"))
    a.join(b, Seq("bk"))
      .filter(col("id1") < col("id2"))
      // dedup pairs that share several keys: group on the two int ids
      // (map-side combinable) instead of a distinct over name strings;
      // the names are functionally dependent on the ids.
      .groupBy("id1", "id2")
      .agg(first(col("name1")).as("name1"), first(col("name2")).as("name2"))
      .withColumn("edit_dist", levenshtein(col("name1"), col("name2")))
      .withColumn("sim_ratio", similarityRatio(col("name1"), col("name2")))
      .filter(col("edit_dist") <= 1 && col("sim_ratio") >= minRatio)
  }
}
