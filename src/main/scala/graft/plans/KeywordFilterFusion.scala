package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Contains, Expression, Literal, Or, RLike}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.NormalizeTextExpr

/** Optimizer rule (SURVEY.md §4): fuse the engine's central predicate —
  * an OR-chain of `Contains(normalize_text(c), term_i)` as produced by
  * `TextFns.keywordAny` — into one pre-compiled
  * `RLike(normalize_text(c), "\Qterm1\E|\Qterm2\E|…")`.
  *
  * This is the same hoist the reference does manually by pre-compiling
  * its keyword regex at module level
  * (`/root/reference/src/scrapers/aracaju_barra_pirambu_scraper.py:36-37`):
  * the normalized string is computed once per row instead of once per
  * Contains branch, and the alternation is a single compiled automaton.
  * Terms are regex-quoted, so semantics are exactly the OR of substring
  * containment; the rewrite only fires when every branch tests the SAME
  * normalized child expression.
  *
  * Registered two ways:
  *  - `GraftExtensions` for `spark.sql.extensions=graft.plans.GraftExtensions`
  *    (new sessions / spark-submit);
  *  - `KeywordFilterFusion.install(spark)` via
  *    `experimental.extraOptimizations` for already-running sessions
  *    (what Verify/Bench use) — same rule object either way.
  */
object KeywordFilterFusion extends Rule[LogicalPlan] {

  /** Collapse an Or-tree of Contains over one shared normalized child
    * into (child, terms); None if any leaf doesn't fit the shape. */
  private def collectTerms(e: Expression): Option[(Expression, Seq[String])] =
    e match {
      case Or(l, r) =>
        for {
          (cl, tl) <- collectTerms(l)
          (cr, tr) <- collectTerms(r)
          if cl.semanticEquals(cr)
        } yield (cl, tl ++ tr)
      // `_: StringType`, not the bare object: Spark 4 string types carry
      // a collation id, so Literal dataType is a StringType instance
      case Contains(child @ NormalizeTextExpr(_), Literal(s: UTF8String, _: StringType)) =>
        Some((child, Seq(s.toString)))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      // transformDown: rewrite the outermost qualifying Or so the whole
      // keyword set fuses into one regex (bottom-up would fuse an inner
      // pair first and hide the rest from the pattern).
      val newCond = cond transformDown {
        case e @ Or(_, _) =>
          collectTerms(e) match {
            case Some((normChild, terms)) if terms.length >= 2 =>
              RLike(normChild,
                Literal(terms.map(Pattern.quote).mkString("|")))
            case _ => e
          }
      }
      if (newCond.fastEquals(cond)) f else Filter(newCond, child)
  }

  /** Enable on an existing session (extensions can't be added after
    * session build; extraOptimizations can). Idempotent. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this))
      spark.experimental.extraOptimizations = cur :+ this
  }
}

/** `--conf spark.sql.extensions=graft.plans.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => KeywordFilterFusion)
}
