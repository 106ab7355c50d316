package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, EqualNullSafe, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graft.ColumnBridge

import graft.sources.{GraftTable, TxnTable}

/** SQL DML over graft tables: `DELETE FROM t WHERE …`, `UPDATE t SET …
  * WHERE …`, and full `MERGE INTO t USING s ON … WHEN …` as plain SQL
  * TEXT on a `USING graft` catalog table (or a DSv2 temp view), each
  * dispatching to the corresponding [[TxnTable]] transactional op —
  * `deleteWhere` / `updateWhere` / `mergeInto` — so a pure-SQL user gets
  * the same one-atomic-commit, manifest-stats-pruned, DV-aware DML the
  * Scala API provides (the Delta extension-dispatch shape).
  *
  * Injection point: a planner [[Strategy]] via
  * `spark.experimental.extraStrategies` ([[GraftDml.install]]), which
  * Spark consults BEFORE its built-in strategies — so the graft match
  * intercepts the plans `DataSourceV2Strategy` would otherwise reject
  * ("table does not support deletes/updates/merges"). Strategies are
  * runtime-injectable into an EXISTING session, which analyzer rules are
  * not — the declared queries receive the driver's already-built session.
  * Non-graft tables never match (the relation's table must be a
  * [[GraftTable]]) and fall through to Spark's own planning untouched.
  *
  * Expression hand-off: the resolved DML condition/assignment trees
  * reference the relation's attributes by exprId; the TxnTable ops
  * re-read the table themselves, so bound references would not resolve.
  * Each attribute is rewritten back to an [[UnresolvedAttribute]] under
  * the name contract of the target op (target columns by name; MERGE
  * source non-key columns as `_src_<name>`, the [[TxnTable.mergeInto]]
  * flattening of Delta's `source.x` qualifiers) and the tree re-resolves
  * against the op's own frame — literals and function calls pass through
  * resolved.
  */
object GraftDml {

  /** Make the current session's SQL DML graft-aware (and restore the
    * statistics surface the V1 bridge drops — [[GraftStatsRestore]]),
    * and register the path catalog that carries SQL time travel
    * (`FROM graft.`/path/`` VERSION AS OF n` — [[GraftCatalog]];
    * runtime-settable, CatalogManager loads catalogs lazily).
    * Idempotent. */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[GraftDmlStrategy]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ new GraftDmlStrategy
    if (!spark.conf.getOption("spark.sql.catalog.graft").isDefined)
      spark.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.GraftCatalog].getName)
    GraftStatsRestore.install(spark)
  }

  /** ALTER TABLE targets resolve to [[ResolvedTable]] (not a DSv2
    * relation) — and for session-catalog `USING graft` tables the
    * resolved handle is Spark's V1Table WRAPPER around the catalog
    * entry, not our GraftTable (only relation resolution goes through
    * `TableProvider.getTable`). Match it structurally via the table
    * properties the wrapper surfaces (provider/location — the
    * TableCatalog property contract), which also keeps this file free
    * of the private[sql] V1Table class. */
  private[plans] def resolvedGraftDir(plan: LogicalPlan): Option[String] =
    plan match {
      case r: org.apache.spark.sql.catalyst.analysis.ResolvedTable => r.table match {
        case t: GraftTable => Some(t.tableDir)
        case t if Option(t.properties.get("provider")).exists(_.equalsIgnoreCase("graft")) =>
          Option(t.properties.get("location")).map(graft.sources.GraftDataSource.normalize)
        case _ => None
      }
      // ADD CHECK CONSTRAINT's child is the analyzer-built VALIDATION
      // scan — Filter(NOT cond) over the relation; unwrap to the table
      case f: Filter => resolvedGraftDir(f.child)
      case _         => graftDir(plan).map(_._1)
    }

  private[plans] def graftDir(plan: LogicalPlan): Option[(String, AttributeSet)] =
    plan match {
      case r: DataSourceV2Relation => r.table match {
        case t: GraftTable => Some((t.tableDir, r.outputSet))
        case _             => None
      }
      // by PLANNING time V2ScanRelationPushDown has rewritten the
      // relation into a scan relation (the strategy sees the OPTIMIZED
      // plan) — the table handle rides on the inner relation
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.relation.table match {
          case t: GraftTable => Some((t.tableDir, r.outputSet))
          case _             => None
        }
      // `UPDATE t AS x` / MERGE aliases wrap the relation
      case SubqueryAlias(_, child) => graftDir(child)
      case _                       => None
    }

  /** Rewrite resolved attribute references back to unresolved names so
    * the expression re-resolves against the TxnTable op's own frame:
    * target attributes keep their name; MERGE source attributes map to
    * the op's `_src_<name>` view (keys keep their name — the join
    * coalesces them). */
  private[plans] def toColumn(e: Expression, tgt: AttributeSet,
                              src: AttributeSet = AttributeSet.empty,
                              keyCols: Set[String] = Set.empty): Column =
    ColumnBridge.column(e.transform {
      case a: AttributeReference if src.contains(a) =>
        UnresolvedAttribute(Seq(if (keyCols(a.name)) a.name else s"_src_${a.name}"))
      case a: AttributeReference if tgt.contains(a) =>
        UnresolvedAttribute(Seq(a.name))
    })

  private[plans] def assignName(a: Assignment): String = a.key match {
    case ar: AttributeReference => ar.name
    case u: UnresolvedAttribute => u.nameParts.last
    case other => throw new UnsupportedOperationException(
      s"graft DML: unsupported assignment target $other (nested fields not supported)")
  }

  /** The TxnTable ops re-resolve the condition against their own frame;
    * a subquery would need its own re-analysis there and instead fails
    * with a confusing downstream error — reject it up front. */
  private[plans] def rejectSubquery(e: Expression, stmt: String): Expression = {
    if (e.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.SubqueryExpression]))
      throw new UnsupportedOperationException(
        s"graft $stmt: subqueries in the condition are not supported " +
          "(rewrite as a join or a literal list)")
    e
  }

  /** `SET a = 1, a = 2` would silently last-win through `.toMap` —
    * reject duplicate targets instead, like ANSI UPDATE does. */
  private[plans] def rejectDupTargets(assigns: Seq[Assignment], stmt: String): Unit = {
    val dup = assigns.map(assignName).groupBy(identity).collect {
      case (n, hits) if hits.sizeIs > 1 => n
    }
    if (dup.nonEmpty) throw new UnsupportedOperationException(
      s"graft $stmt: duplicate assignment target(s) ${dup.mkString(", ")}")
  }
}

/** The planner strategy. Matching is deliberately narrow: only resolved
  * DML roots whose target is a graft DSv2 relation. */
final class GraftDmlStrategy extends SparkStrategy {

  import GraftDml._

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {

    case DeleteFromTable(target, condition) if graftDir(target).isDefined =>
      val (dir, tgt) = graftDir(target).get
      GraftDmlExec("graft delete", { spark =>
        TxnTable.deleteWhere(spark, dir,
          toColumn(rejectSubquery(condition, "DELETE"), tgt)): Unit
      }) :: Nil

    case UpdateTable(target, assignments, condition) if graftDir(target).isDefined =>
      val (dir, tgt) = graftDir(target).get
      rejectDupTargets(assignments, "UPDATE")
      val set = assignments.map(a => assignName(a) -> toColumn(a.value, tgt)).toMap
      GraftDmlExec("graft update", { spark =>
        TxnTable.updateWhere(spark, dir,
          condition.map(c => toColumn(rejectSubquery(c, "UPDATE"), tgt))
            .getOrElse(org.apache.spark.sql.functions.lit(true)), set): Unit
      }) :: Nil

    case m: MergeIntoTable if graftDir(m.targetTable).isDefined =>
      val (dir, tgt) = graftDir(m.targetTable).get
      require(!m.withSchemaEvolution,
        "graft MERGE: WITH SCHEMA EVOLUTION is not supported")
      val src = m.sourceTable.outputSet
      // the ON clause must be a key-equality conjunction t.k = s.k —
      // the mergeInto key contract (hash-joinable; arbitrary ON would
      // make "matched" undecidable from a key join)
      def conjuncts(e: Expression): Seq[Expression] = e match {
        case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
          conjuncts(l) ++ conjuncts(r)
        case other => Seq(other)
      }
      val keyCols = conjuncts(m.mergeCondition).map {
        case EqualTo(a: AttributeReference, b: AttributeReference) => (a, b)
        case EqualNullSafe(a: AttributeReference, b: AttributeReference) => (a, b)
        case other => throw new UnsupportedOperationException(
          s"graft MERGE: ON must be a conjunction of column equalities, got $other")
      }.map {
        case (a, b) if tgt.contains(a) && src.contains(b) && a.name == b.name => a.name
        case (a, b) if tgt.contains(b) && src.contains(a) && a.name == b.name => a.name
        case (a, b) => throw new UnsupportedOperationException(
          s"graft MERGE: ON equality must pair same-named target/source columns, " +
            s"got ${a.name} = ${b.name}")
      }
      val keySet = keyCols.toSet
      def cond(c: Option[Expression]): Column =
        c.map(e => toColumn(rejectSubquery(e, "MERGE"), tgt, src, keySet))
          .getOrElse(org.apache.spark.sql.functions.lit(true))
      def clauses(actions: Seq[MergeAction], family: String): Seq[TxnTable.MatchedClause] =
        actions.map {
          case UpdateAction(c, assigns, _) =>
            rejectDupTargets(assigns, "MERGE UPDATE")
            // `SET k = s.k` (the identity Spark's resolver itself adds
            // under UPDATE SET *) is a no-op — the key join already
            // coalesces keys — and is dropped; any OTHER value assigned
            // to a key column would be silently ignored, so reject it
            // (the Scala-API mergeInto contract: "SET on a merge key is
            // not supported").
            val (keyAssigns, dataAssigns) =
              assigns.partition(a => keySet(assignName(a)))
            keyAssigns.foreach { a =>
              val identity = a.value match {
                case ar: AttributeReference =>
                  ar.name == assignName(a) && (src.contains(ar) || tgt.contains(ar))
                case _ => false
              }
              if (!identity) throw new UnsupportedOperationException(
                s"graft MERGE: SET on merge key '${assignName(a)}' is not " +
                  s"supported (got ${a.value.sql}); keys identify the row and " +
                  "cannot be rewritten — DELETE + INSERT instead")
            }
            TxnTable.MatchedUpdate(cond(c),
              dataAssigns
                .map(a => assignName(a) -> toColumn(a.value, tgt, src, keySet)).toMap)
          case DeleteAction(c) => TxnTable.MatchedDelete(cond(c))
          case other => throw new UnsupportedOperationException(
            s"graft MERGE: unsupported $family action $other")
        }
      val whenMatched = clauses(m.matchedActions, "WHEN MATCHED")
      val bySource = clauses(m.notMatchedBySourceActions, "WHEN NOT MATCHED BY SOURCE")
      // INSERT must be the source row itself (INSERT * / identity column
      // list) — mergeInto inserts the source row; a value-rewriting
      // insert would need a projected source, rejected for clarity
      val (insertNotMatched, insertCond) = m.notMatchedActions match {
        case Nil => (false, org.apache.spark.sql.functions.lit(true))
        case Seq(InsertAction(c, assigns)) =>
          assigns.foreach { a =>
            val ok = a.value match {
              case ar: AttributeReference =>
                src.contains(ar) && ar.name == assignName(a)
              case _ => false
            }
            if (!ok) throw new UnsupportedOperationException(
              s"graft MERGE: WHEN NOT MATCHED must INSERT the source row " +
                s"(INSERT * or an identity column list), got $a")
          }
          (true, cond(c))
        case other => throw new UnsupportedOperationException(
          s"graft MERGE: exactly one WHEN NOT MATCHED clause supported, got $other")
      }
      val sourcePlan = m.sourceTable
      GraftDmlExec("graft merge", { spark =>
        TxnTable.mergeInto(spark, dir,
          ColumnBridge.dataFrame(spark, sourcePlan), keyCols,
          whenMatched, insertNotMatched, insertCond,
          whenNotMatchedBySource = bySource): Unit
      }) :: Nil

    // ---- SQL constraint DDL (Spark 4's ANSI constraint grammar):
    // ALTER TABLE t ADD CONSTRAINT name CHECK (expr) / DROP CONSTRAINT.
    // The manifest-carried constraint set is the graft-native storage
    // (addConstraint validates EXISTING rows before committing, exactly
    // like Delta's ADD CONSTRAINT), so the DSv2 TableChange path —
    // which our catalog-less tables never receive — is bypassed.
    case AddCheckConstraint(t, check) if resolvedGraftDir(t).isDefined =>
      val dir = resolvedGraftDir(t).get
      GraftDmlExec("graft add constraint", { spark =>
        TxnTable.addConstraint(spark, dir, check.name, check.condition): Unit
      }) :: Nil

    case DropConstraint(t, name, ifExists, _) if resolvedGraftDir(t).isDefined =>
      val dir = resolvedGraftDir(t).get
      GraftDmlExec("graft drop constraint", { _ =>
        val has = TxnTable.latestVersion(dir).exists(v =>
          TxnTable.snapshot(dir, v).constraints.contains(name))
        if (has) TxnTable.dropConstraint(dir, name): Unit
        else if (!ifExists) throw new IllegalArgumentException(
          s"no constraint $name on graft table $dir")
      }) :: Nil

    case _ => Nil
  }
}

/** Leaf exec running one TxnTable DML op exactly once (the
  * ExecutedCommandExec side-effect shape: DML logical plans are
  * Commands, so QueryExecution eagerly executes this node and the
  * query returns its empty result). */
final case class GraftDmlExec(label: String, body: SparkSession => Unit)
    extends LeafExecNode {

  override def output: Seq[Attribute] = Nil

  override def nodeName: String = s"GraftDml($label)"

  private lazy val sideEffect: Array[InternalRow] = {
    body(session)
    Array.empty[InternalRow]
  }

  override def executeCollect(): Array[InternalRow] = sideEffect

  override protected def doExecute(): RDD[InternalRow] =
    sparkContext.parallelize(sideEffect.toSeq, 1)
}
