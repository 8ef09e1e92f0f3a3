package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Contains, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-operator Catalyst extension (SURVEY §7.3 preference (c): a
  * custom LogicalPlan + Rule + SparkStrategy + SparkPlan, the tier above
  * the expression kernels) for the SUBSTRING-MATCH JOIN
  * `corpus JOIN patterns ON contains(text, pat)`.
  *
  * Why the full plan tier: Spark has no equi-key to hash on — `contains`
  * admits no join key — so the built-in planner's only option is
  * BroadcastNestedLoopJoin, which evaluates `contains` corpus×patterns
  * times: every document is RESCANNED once per pattern. No expression
  * kernel can fix that (the join SHAPE is the problem), but the operator
  * itself is a textbook multi-pattern search: compile the pattern side
  * into one Aho–Corasick automaton (plans/StringSearch.scala) and stream
  * each document through it ONCE — O(len + matches) per document
  * regardless of pattern count.
  *
  * The rewrite is DECLARATIVE-TRANSPARENT: users write the natural
  * `corpus.join(patterns, $"text".contains($"pat"))` and the injected
  * optimizer rule swaps the plan; results are bitwise those of the
  * nested-loop join (SubstringJoinSpec pins equality, nulls and empty
  * patterns included: a null pattern or text never matches — Contains
  * evaluates null, filtered by the join — and an empty pattern matches
  * every non-null document).
  *
  * Scale shape: the pattern side is executed once and broadcast
  * (benchmark suites are fixed-size; a loud require bounds the automaton,
  * the exactDecontaminate doctrine); the corpus side streams with NO
  * shuffle and NO per-pattern rescan, preserving the streamed side's
  * partitioning.
  *
  * Installation: `SubstringJoin.install(spark)` injects into the live
  * session via `spark.experimental` (idempotent), or configure
  * `spark.sql.extensions=graft.plans.SubstringJoinExtensions` at session
  * build for the SparkSessionExtensions path.
  */
case class SubstringJoinPlan(left: LogicalPlan, right: LogicalPlan,
                             text: Expression, pat: Expression)
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): LogicalPlan =
    copy(left = l, right = r)
}

/** Rewrites inner joins whose ENTIRE condition is one deterministic
  * `Contains(text-from-left, pat-from-right)` — deliberately narrow: any
  * composite condition keeps the built-in plan.
  */
object RewriteContainsJoin extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Join(l, r, Inner, Some(c @ Contains(t, p)), _)
        if c.deterministic &&
          t.references.nonEmpty && t.references.subsetOf(l.outputSet) &&
          p.references.nonEmpty && p.references.subsetOf(r.outputSet) =>
      SubstringJoinPlan(l, r, t, p)
  }
}

object SubstringJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case SubstringJoinPlan(l, r, t, p) =>
      SubstringJoinExec(planLater(l), planLater(r), t, p) :: Nil
    case _ => Nil
  }
}

case class SubstringJoinExec(left: SparkPlan, right: SparkPlan,
                             text: Expression, pat: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output
  // the corpus side streams through unmoved; only the pattern side is
  // collected — the streamed partitioning survives for downstream reuse
  override def outputPartitioning = left.outputPartitioning

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numPatterns" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of patterns"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numPatterns = longMetric("numPatterns")
    val patRows = right.executeCollect().map(_.copy())
    numPatterns.add(patRows.length)
    val boundPat = BindReferences.bindReference(pat, right.output)
    val pats: Array[String] = patRows.map { row =>
      val v = boundPat.eval(row)
      if (v == null) null else v.asInstanceOf[UTF8String].toString
    }
    val totalChars = pats.iterator.filter(_ != null).map(_.length.toLong).sum
    require(totalChars <= SubstringJoin.MaxPatternChars,
      s"pattern side is $totalChars chars, past the automaton bound " +
        s"(${SubstringJoin.MaxPatternChars}) — shard the pattern set")
    val bc = sparkContext.broadcast((pats, patRows))
    val boundText = BindReferences.bindReference(text, left.output)
    val outAttrs = output
    left.execute().mapPartitions { iter =>
      val (patsL, rowsL) = bc.value
      val indexed = patsL.zipWithIndex
      val searchable = indexed.filter { case (s, _) => s != null && s.nonEmpty }
      val ac = AhoCorasick.build(searchable.map(_._1))
      val emptyIdxs = indexed.collect { case (s, i) if s != null && s.isEmpty => i }
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      iter.flatMap { lrow =>
        val tv = boundText.eval(lrow)
        if (tv == null) Iterator.empty
        else {
          val firstEnds = ac.searchFirstEnds(tv.asInstanceOf[UTF8String].toString)
          val hits = Iterator.range(0, firstEnds.length)
            .filter(firstEnds(_) >= 0).map(k => searchable(k)._2) ++
            emptyIdxs.iterator
          hits.map { pi =>
            numOutputRows += 1
            proj(joined(lrow, rowsL(pi)))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}

object SubstringJoin {
  /** Automaton bound — the exactDecontaminate doctrine: pattern sides are
    * suite-sized by nature; past this, fail loudly rather than OOM.
    */
  val MaxPatternChars: Long = 64L << 20

  /** Idempotent live-session injection via `spark.experimental`. */
  def install(spark: SparkSession): Unit = synchronized {
    val e = spark.experimental
    if (!e.extraOptimizations.contains(RewriteContainsJoin))
      e.extraOptimizations = e.extraOptimizations :+ RewriteContainsJoin
    if (!e.extraStrategies.contains(SubstringJoinStrategy))
      e.extraStrategies = e.extraStrategies :+ SubstringJoinStrategy
  }

  /** The natural declarative form, with the rewrite guaranteed installed. */
  def containsJoin(corpus: DataFrame, patterns: DataFrame,
                   text: Column, pat: Column): DataFrame = {
    install(corpus.sparkSession)
    corpus.join(patterns, text.contains(pat))
  }
}

/** `spark.sql.extensions` entry point (session-build-time injection). */
class SubstringJoinExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteContainsJoin)
    ext.injectPlannerStrategy(_ => SubstringJoinStrategy)
  }
}
