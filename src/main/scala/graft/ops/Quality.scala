package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the expectations gate every
  * production pipeline runs before publishing a table (the engine-grade
  * form of the reference's only "validation", HTTP status checks at
  * resources/gmail_functions.py:131, 311).
  *
  * A constraint list compiles into a FIXED, small plan regardless of
  * data size: every row-local check (not-null, range, set-membership)
  * folds into ONE aggregate pass over the table; each uniqueness check
  * is one groupBy counting surplus rows; each referential check is one
  * anti-join counting orphans. The result is a tiny (check, violations,
  * pass) relation — cheap enough to gate every batch on.
  */
object Quality {

  sealed trait Check { def name: String }
  /** `col` must never be null. */
  case class NotNull(col: String) extends Check {
    def name = s"not_null($col)"
  }
  /** Non-null values of `col` must lie in [lo, hi]. */
  case class InRange(col: String, lo: Double, hi: Double) extends Check {
    def name = s"in_range($col)"
  }
  /** Non-null values of `col` must be one of `values`. */
  case class InSet(col: String, values: Seq[String]) extends Check {
    def name = s"in_set($col)"
  }
  /** `cols` must be a key: violations = rows beyond the first per
    * duplicated key value.
    */
  case class Unique(cols: Seq[String]) extends Check {
    def name = s"unique(${cols.mkString(",")})"
  }
  /** Every non-null `col` must exist in `dimCol` of `dim` (foreign
    * key): violations = orphan rows.
    */
  case class RefIntegrity(col: String, dim: DataFrame, dimCol: String)
      extends Check {
    def name = s"ref($col)"
  }

  private def violated(c: Check): Column = c match {
    case NotNull(col0) => col(col0).isNull
    case InRange(col0, lo, hi) =>
      col(col0).isNotNull && (col(col0) < lo || col(col0) > hi)
    case InSet(col0, vs) =>
      col(col0).isNotNull && !col(col0).isin(vs: _*)
    case _ => lit(false)
  }

  /** Audit `df` against `checks`: one row per check with its violation
    * count and pass flag, ordered by check name. Lazy DataFrame — the
    * caller decides when (and how often) to pay for it.
    */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    // empty checks would hit reduce on no pieces; duplicate rendered
    // names would build a duplicate-key map() and throw at RUNTIME under
    // the default mapKeyDedupPolicy=EXCEPTION — both fail here with a
    // message naming the problem instead
    require(checks.nonEmpty, "Quality.audit: checks must be non-empty")
    val dupNames = checks.groupBy(_.name).collect {
      case (n, cs) if cs.size > 1 => n
    }
    require(dupNames.isEmpty,
      s"Quality.audit: duplicate check names ${dupNames.mkString(", ")} — " +
        "give same-column checks distinct names")
    val rowLocal = checks.filter {
      case _: NotNull | _: InRange | _: InSet => true; case _ => false
    }
    val pieces = Seq.newBuilder[DataFrame]
    if (rowLocal.nonEmpty) {
      // coalesce: sum() over ZERO rows is null, and a null violation
      // count makes pass null too — an empty batch must audit as
      // 0 violations / pass=true, not as neither-pass-nor-fail
      val aggs = rowLocal.map(c =>
        coalesce(sum(when(violated(c), 1L).otherwise(0L)), lit(0L))
          .as(c.name))
      val wide = df.agg(aggs.head, aggs.tail: _*)
      pieces += wide.select(explode(map(
        rowLocal.flatMap(c => Seq(lit(c.name), col(c.name))): _*))
        .as(Seq("check", "violations")))
    }
    checks.collect { case u: Unique =>
      pieces += df.groupBy(u.cols.map(col): _*)
        .agg(count(lit(1)).as("_n"))
        .agg(coalesce(sum(when(col("_n") > 1, col("_n") - 1)), lit(0L))
          .as("violations"))
        .select(lit(u.name).as("check"), col("violations"))
    }
    checks.collect { case r: RefIntegrity =>
      pieces += df.filter(col(r.col).isNotNull)
        .join(r.dim.select(col(r.dimCol).as(r.col)).distinct(),
          Seq(r.col), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(r.name).as("check"), col("violations"))
    }
    pieces.result().reduce(_ unionAll _)
      .select(col("check"), col("violations"),
        (col("violations") === 0L).as("pass"))
      .orderBy(col("check"))
  }
}
