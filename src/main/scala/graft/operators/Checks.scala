package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Data-quality constraint checks — the engine-side analog of the dbt
 * schema tests the reference runs on every build (reference:
 * dbt/job_dbt/models/marts/schema.yml:10-25 — `unique` / `not_null` on
 * `job_uid`, `accepted_values` on enum columns). A daily pipeline without
 * these ships silent corruption; here they are one declarative operator
 * returning a violations summary a scheduler can gate on.
 *
 * Semantics follow dbt's tests:
 *  - `unique`: number of DISTINCT non-null key values occurring more than
 *    once (dbt's `GROUP BY col HAVING count(*) > 1` row count; nulls are
 *    the `not_null` test's job);
 *  - `not_null`: number of rows where the column is null;
 *  - `accepted_values`: number of rows whose NON-NULL value is outside the
 *    allowed domain (as in dbt, nulls pass — they are flagged by
 *    `not_null` when both tests are declared);
 *  - `relationships`: number of rows whose NON-NULL foreign-key value has
 *    no match in the parent table (dbt's referential-integrity test,
 *    schema.yml:81 — fct_jobs.company_id → dim_companies).
 *
 * Scale shape: all `not_null` + `accepted_values` checks fold into ONE
 * full-scan aggregation (conditional counts — map-side combinable, zero
 * extra shuffle beyond the single-row reduce); each `unique` check is one
 * groupBy on its key (partial-agg'd count per key, then a single-row
 * reduce of the >1 groups); each `relationships` check is one left-anti
 * join of the fact against the parent's DISTINCT keys — Catalyst
 * broadcasts the (deduplicated, single-column) key set when the parent is
 * a dim, and falls back to a shuffled hash join keyed on the FK when it
 * is not. Nothing is collected to the driver; the result is a tiny
 * DataFrame of (check_name, column_name, n_violations).
 */
object Checks {

  /**
   * Violation summary for the declared constraints: one row per
   * (check_name, column_name) with its violation count — 0 everywhere
   * means the table passes.
   */
  def violations(df: DataFrame, unique: Seq[String], notNull: Seq[String],
      acceptedValues: Seq[(String, Seq[String])],
      relationships: Seq[(String, DataFrame, String)] = Seq.empty): DataFrame = {
    require(unique.nonEmpty || notNull.nonEmpty || acceptedValues.nonEmpty ||
      relationships.nonEmpty, "at least one constraint must be declared")
    val rowLevel: Seq[DataFrame] =
      if (notNull.isEmpty && acceptedValues.isEmpty) Seq.empty
      else {
        val aggs =
          notNull.map(c => count(when(col(c).isNull, lit(1))).as(s"nn_$c")) ++
            acceptedValues.map { case (c, vals) =>
              count(when(col(c).isNotNull && !col(c).isin(vals.map(lit): _*), lit(1)))
                .as(s"av_$c")
            }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val rows =
          notNull.map(c => struct(lit("not_null").as("check_name"),
            lit(c).as("column_name"), col(s"nn_$c").as("n_violations"))) ++
            acceptedValues.map { case (c, _) => struct(lit("accepted_values").as("check_name"),
              lit(c).as("column_name"), col(s"av_$c").as("n_violations"))
            }
        Seq(one.select(explode(array(rows: _*)).as("v")).select("v.*"))
      }
    val uniques = unique.map { c =>
      df.filter(col(c).isNotNull)
        .groupBy(col(c))
        .agg(count(lit(1)).as("cnt"))
        .agg(count(when(col("cnt") > 1, lit(1))).as("n_violations"))
        .select(lit("unique").as("check_name"), lit(c).as("column_name"),
          col("n_violations"))
    }
    val rels = relationships.map { case (c, parent, pc) =>
      df.filter(col(c).isNotNull)
        .join(parent.select(col(pc).as("__parent_key")).distinct(),
          col(c) === col("__parent_key"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("relationships").as("check_name"), lit(c).as("column_name"),
          col("n_violations"))
    }
    (rowLevel ++ uniques ++ rels).reduce(_.unionAll(_))
  }
}
