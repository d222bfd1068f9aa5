package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality constraints — the Deequ-style audit
 * (Schelter et al. 2018) a 100 TB ingest runs before data is admitted:
 * each constraint folds to ONE aggregate over a single scan, and the
 * report is one row per constraint (checked count, violations, pass).
 *
 * Reference surface: the reference validates at the type level
 * (vector dims, quota checks); the table-level constraint audit is
 * the warehouse extension, public-method work.
 *
 * Scale shape: all single-column constraints on a table FUSE into one
 * pass (a single agg with one cell per constraint — no per-constraint
 * scans); uniqueness adds one two-phase count-distinct family, and
 * referential integrity is one left-anti join on the key (broadcast
 * when the parent side is small, AQE otherwise).
 */
object DataQuality {

  /** A single-scan constraint: a name plus a violation predicate
    * (true = row violates) over the scanned row. */
  final case class RowCheck(name: String, violates: Column)

  /** Audits `df` in ONE scan against `checks`, plus optional
    * uniqueness over a key column set and referential containment of
    * `fkCol` in `parent(pkCol)`. Emits one row per constraint:
    * (check_name, n_checked, n_violations, pass) — `check_name`, not
    * `constraint`, which is a reserved word downstream. */
  def audit(df: DataFrame, checks: Seq[RowCheck],
            uniqueKey: Seq[String] = Nil,
            fk: Option[(String, DataFrame, String)] = None): DataFrame = {
    require(checks.nonEmpty || uniqueKey.nonEmpty || fk.nonEmpty,
      "no constraints given")
    val spark = df.sparkSession
    import spark.implicits._
    // coalesce: on an EMPTY table sum() is NULL and the report must
    // still read 0 violations over 0 rows, not NPE
    val aggs = count(lit(1)).as("__n") +:
      checks.zipWithIndex.map { case (c, i) =>
        coalesce(sum(when(c.violates, 1L).otherwise(0L)), lit(0L))
          .as(s"__v$i")
      }
    val scanRow = df.agg(aggs.head, aggs.tail: _*).head()
    val n = scanRow.getLong(0)
    val scanRows = checks.zipWithIndex.map { case (c, i) =>
      (c.name, n, scanRow.getLong(i + 1))
    }
    val uniqRows = if (uniqueKey.isEmpty) Nil else {
      val r = df.agg(count(lit(1)).as("n"),
        countDistinct(uniqueKey.head, uniqueKey.tail: _*).as("d")).head()
      Seq((s"unique(${uniqueKey.mkString(",")})", r.getLong(0),
        r.getLong(0) - r.getLong(1)))
    }
    val fkRows = fk.toSeq.map { case (fkCol, parent, pkCol) =>
      val orphans = df.select(col(fkCol))
        .join(parent.select(col(pkCol)), col(fkCol) === col(pkCol),
          "left_anti")
        .count()
      (s"fk($fkCol -> $pkCol)", n, orphans)
    }
    (scanRows ++ uniqRows ++ fkRows)
      .toDF("check_name", "n_checked", "n_violations")
      .withColumn("pass", col("n_violations") === 0L)
  }
}
