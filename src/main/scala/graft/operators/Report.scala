package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Run-summary report — the engine analog of the reference's notification
 * step (airflow/dags/jobs_etl_daily.py step 9 "Sends notification email
 * with summary", payload built at jobs_etl_daily.py:1389;
 * services/notifier/email.py:100 `send`): the one table a scheduler
 * gates on / mails out after a pipeline run. The SMTP/HTML side is out
 * of engine scope; this is the table its payload is generated FROM.
 *
 * Output rows (section, item, value):
 *   - run / checks_failed            — number of failed quality checks
 *     (0 = the run gate passes; the reference's SUCCESS/FAILED line)
 *   - counts / <stage>               — rows flowing out of each stage
 *     (the reference's extracted/staged/deduped/enriched/ranked counts)
 *   - failed_checks / <check>:<col>  — violation count per FAILED check
 *     (the reference's "Failed tasks" list)
 *   - source_volume / <source>       — per-source row volume
 *
 * Scale shape: the checks relation ([[Checks.violations]] output) is
 * consumed ONCE — a rollup over its failed subset yields the per-check
 * rows and the grand-total status row in a single pass (the () grouping
 * set aggregates even an all-passing run into its 0 row). Each stage
 * count is one COUNT aggregate; in production those run over the stage
 * outputs the pipeline just wrote — a cheap scan of a materialized
 * table, exactly as the reference reads its counts back from Postgres —
 * not a re-execution of the stage. Nothing collects to the driver.
 */
object Report {

  /** @param stageCounts   (stage name, stage output) pairs, reported in
    *                      pipeline order as `counts` rows
    * @param checkViolations a [[Checks.violations]]-shaped frame
    *                      (check_name, column_name, n_violations)
    * @param sourceVolumes (item, value) per-source volumes */
  def runSummary(stageCounts: Seq[(String, DataFrame)], checkViolations: DataFrame,
      sourceVolumes: DataFrame): DataFrame = {
    require(stageCounts.nonEmpty, "report at least one stage")
    // rollup over ALL declared checks, not just the failed subset: Spark
    // grouping sets yield ZERO rows over an empty input — even the ()
    // set — so an all-passing run would lose its status row if the
    // filter came first. The checks relation is non-empty by the
    // Checks.violations contract (>=1 declared constraint), failures are
    // counted conditionally, and passing per-check rows drop afterwards.
    // (grouping() must reference a plain grouping COLUMN, not an alias
    // born inside the rollup clause — hence the projection first.)
    val checks = checkViolations
      .withColumn("item0", concat(col("check_name"), lit(":"), col("column_name")))
      .rollup(col("item0"))
      .agg(count(when(col("n_violations") > 0, 1)).as("nf"),
        sum(col("n_violations")).as("nv"),
        grouping(col("item0")).as("g"))
      .filter(col("g") === 1 || col("nv") > 0)
      .select(
        when(col("g") === 1, lit("run")).otherwise(lit("failed_checks")).as("section"),
        when(col("g") === 1, lit("checks_failed")).otherwise(col("item0")).as("item"),
        when(col("g") === 1, col("nf")).otherwise(col("nv")).cast("bigint").as("value"))
    val counts = stageCounts.map { case (stage, df) =>
      df.agg(count(lit(1)).as("cnt"))
        .select(lit("counts").as("section"), lit(stage).as("item"),
          col("cnt").cast("bigint").as("value"))
    }.reduce(_.unionAll(_))
    val sources = sourceVolumes.select(lit("source_volume").as("section"),
      col("item").cast("string").as("item"), col("value").cast("bigint").as("value"))
    checks.unionAll(counts).unionAll(sources)
  }

  /** Labeled conditional counts over ONE relation in ONE aggregate, as
    * `counts` rows unionable onto [[runSummary]]'s output. For stages
    * that are filters of the same producing plan (a mart and its top-N
    * cut), separate `stageCounts` entries would RE-EXECUTE that plan
    * once per label — the same anti-pattern the engine two-phases
    * everywhere else. One pass, one row per label. */
  def countsOf(df: DataFrame, labels: Seq[(String, Column)]): DataFrame = {
    require(labels.nonEmpty, "count at least one label")
    require(labels.map(_._1).distinct.size == labels.size,
      s"labels must be distinct, got ${labels.map(_._1).mkString(", ")}")
    // agg columns are keyed by INDEX, not label: round-tripping a label
    // through a column name and back via col() would parse dots in the
    // label as struct-field access
    val aggs = labels.zipWithIndex.map { case ((_, pred), i) =>
      count(when(pred, lit(1))).as(s"__c_$i")
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(labels.zipWithIndex.map { case ((lbl, _), i) => struct(
        lit("counts").as("section"), lit(lbl).as("item"),
        col(s"__c_$i").cast("bigint").as("value")) }: _*)).as("r"))
      .select(col("r.*"))
  }
}
