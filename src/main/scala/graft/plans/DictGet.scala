package graft.plans

import graft.operators.Dictionaries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** `dictGet('dict', 'attr', key)` / `dictGetOrDefault(…, default)` /
  * `dictHas('dict', key)` — ClickHouse's dictionary lookups.
  *
  * The function registration (in [[ChDialect]]) only plants this
  * placeholder; [[DictGetRewrite]] (an analyzer resolution rule)
  * replaces every placeholder with an attribute of a broadcast
  * left-outer join against the registered dictionary table. The
  * lookup therefore never executes as an expression — by the time the
  * optimizer runs, the plan is an ordinary join Catalyst can reorder,
  * codegen and (at scale) spill like any other.
  */
sealed abstract class DictLookup extends Expression with Unevaluable {
  def dictName: String
  def key: Expression
  override lazy val resolved: Boolean = childrenResolved
}

case class DictGetExpr(dictName: String, attrName: String, key: Expression,
                       default: Option[Expression]) extends DictLookup {
  override def children: Seq[Expression] = key +: default.toSeq
  override def dataType: DataType = Dictionaries.get(dictName).attrType(attrName)
  override def nullable: Boolean = true
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren.head, default = newChildren.lift(1))
}

case class DictHasExpr(dictName: String, key: Expression) extends DictLookup {
  override def children: Seq[Expression] = Seq(key)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren.head)
}

/** `dictGetHierarchy('dict', key)` — the key's ancestor chain [key,
  * parent(key), …, root] as ARRAY<BIGINT>; a key absent from the
  * dictionary yields [key] (the walk stops immediately), matching
  * ClickHouse. Resolved against the dictionary's hierarchy-closure
  * table ([[graft.operators.Dictionaries.hierarchyClosure]]) via the
  * same broadcast-join machinery as dictGet — one hash probe per row,
  * never a per-row parent walk. */
case class DictGetHierarchyExpr(dictName: String, key: Expression) extends DictLookup {
  override def children: Seq[Expression] = Seq(key)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren.head)
}

/** `dictIsIn('dict', child, ancestor)` — whether `ancestor` appears
  * in `child`'s hierarchy chain (child itself included, so
  * child = ancestor holds, as in ClickHouse). */
case class DictIsInExpr(dictName: String, child: Expression, ancestor: Expression)
  extends DictLookup {
  override def key: Expression = child
  override def children: Seq[Expression] = Seq(child, ancestor)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head, ancestor = newChildren(1))
}

/** `dictGetChildren('dict', key)` (level = 1) and
  * `dictGetDescendants('dict', key[, level])` (level 0 = the whole
  * subtree) — the DOWNWARD hierarchy walkers, served from a
  * per-(dict, level) descendants-closure table through the same
  * broadcast-join machinery. Keys absent from the dictionary (and
  * leaves) yield []. Arrays are sorted ascending — deterministic
  * where ClickHouse leaves order internal, hence oracle-able. */
case class DictDescendantsExpr(dictName: String, key: Expression, level: Int)
  extends DictLookup {
  require(level >= 0, s"dictGetDescendants level must be ≥ 0, got $level")
  override def children: Seq[Expression] = Seq(key)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren.head)
}

/** Rewrites [[DictLookup]] placeholders into broadcast left-outer
  * joins during analysis.
  *
  * For each operator whose expressions contain lookups, the distinct
  * (dictionary, key-expression) pairs each contribute ONE join under
  * the operator — several `dictGet`s on different attributes of the
  * same dictionary with the same key share a single join, exactly as
  * ClickHouse serves them from a single hashed dictionary. Lookups
  * then become plain attribute references (`dictGetOrDefault` a
  * Coalesce, `dictHas` an IsNotNull on the joined key).
  *
  * Operators whose output is their child's (Filter, Sort, …) get a
  * restoring Project on top so the widened join never leaks columns
  * upward; Project/Aggregate outputs are their own expression lists,
  * which the substitution leaves name-identical.
  */
case class DictGetRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def lookups(p: LogicalPlan): Seq[DictLookup] =
    p.expressions.flatMap(_.collect { case d: DictLookup => d })

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case p: UnaryNode if p.childrenResolved && lookups(p).nonEmpty &&
        lookups(p).forall(_.children.forall(_.resolved)) =>
      rewrite(p)
  }

  private def rewrite(p: UnaryNode): LogicalPlan = {
    val selfOutputting = p.isInstanceOf[Project] || p.isInstanceOf[Aggregate]
    val savedOutput = p.output
    val all = lookups(p)
    val flat = all.filter {
      case _: DictGetExpr | _: DictHasExpr => true
      case _ => false
    }
    val hier = all.filter {
      case _: DictGetHierarchyExpr | _: DictIsInExpr => true
      case _ => false
    }
    val down = all.collect { case d: DictDescendantsExpr => d }

    // distinct (dict, key-expression) pairs, each with the union of
    // attributes every lookup on that pair needs → exactly one join per pair
    var pairs = Seq.empty[(String, Expression, Seq[String])]
    for (l <- flat) {
      val attrsWanted = l match {
        case g: DictGetExpr => Seq(g.attrName)
        case _              => Nil
      }
      pairs.indexWhere { case (d, k, _) => d == l.dictName && k.semanticEquals(l.key) } match {
        case -1 => pairs :+= ((l.dictName, l.key, attrsWanted))
        case i  => pairs = pairs.updated(i,
          (pairs(i)._1, pairs(i)._2, (pairs(i)._3 ++ attrsWanted).distinct))
      }
    }

    var child: LogicalPlan = p.children.head
    // (dict, key) → (joined key attribute, attr name → attribute)
    var resolvedJoins = Seq.empty[(String, Expression, Attribute, Map[String, Attribute])]
    for ((dictName, key, attrs) <- pairs) {
      val dict = Dictionaries.get(dictName)
      val kcols = dict.keyCols
      // COMPLEX_KEY: the lookup key must be tuple(k1, k2, …) — its
      // parts join each key column separately, so every equality is
      // a plain codegen'd comparison (no struct materialization)
      val parts: Seq[Expression] =
        if (kcols.size == 1) Seq(key)
        else key match {
          case ns: CreateNamedStruct if ns.valExprs.size == kcols.size => ns.valExprs
          case _ => throw new IllegalArgumentException(
            s"dictionary '$dictName' has a composite key (${kcols.mkString(", ")}): " +
              s"pass tuple(${kcols.mkString(", ")}) with ${kcols.size} elements as the key")
        }
      val want = attrs.filterNot(kcols.contains)
      val proj = dict.source().selectExpr((kcols ++ want).map(n => s"`$n`"): _*)
        .queryExecution.analyzed
      val keyAttrs = proj.output.take(kcols.size)
      // lookups on a key column itself resolve to the joined key attr
      val attrMap = want.zip(proj.output.drop(kcols.size)).toMap ++
        attrs.filter(kcols.contains).map(a => a -> keyAttrs(kcols.indexOf(a))).toMap
      val cond = parts.zip(keyAttrs).map { case (k, a) =>
        EqualTo(Cast(k, a.dataType), a): Expression
      }.reduce(And)
      child = Join(child, proj, LeftOuter, Some(cond),
        JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))
      resolvedJoins :+= ((dictName, key, keyAttrs.head, attrMap))
    }

    // hierarchy lookups join the dictionary's closure table instead —
    // one broadcast join per distinct (dict, child-key expression)
    var hierPairs = Seq.empty[(String, Expression)]
    for (l <- hier)
      if (!hierPairs.exists { case (d, k) => d == l.dictName && k.semanticEquals(l.key) })
        hierPairs :+= ((l.dictName, l.key))
    // (dict, key) → chain attribute of the joined closure
    var hierJoins = Seq.empty[(String, Expression, Attribute)]
    for ((dictName, key) <- hierPairs) {
      val proj = Dictionaries.hierarchyClosure(dictName).queryExecution.analyzed
      val keyAttr = proj.output.head
      child = Join(child, proj, LeftOuter,
        Some(EqualTo(Cast(key, LongType), keyAttr)),
        JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))
      hierJoins :+= ((dictName, key, proj.output(1)))
    }

    def chainOf(dictName: String, key: Expression): Expression = {
      val (_, _, chainAttr) = hierJoins.find { case (d, k, _) =>
        d == dictName && k.semanticEquals(key)
      }.get
      // an unknown key walks nowhere: its chain is just [key]
      Coalesce(Seq(chainAttr, CreateArray(Seq(Cast(key, LongType)))))
    }

    // downward walkers: one broadcast join per distinct
    // (dict, key expression, level)
    var downPairs = Seq.empty[(String, Expression, Int)]
    for (l <- down)
      if (!downPairs.exists { case (d, k, lv) =>
            d == l.dictName && k.semanticEquals(l.key) && lv == l.level })
        downPairs :+= ((l.dictName, l.key, l.level))
    var downJoins = Seq.empty[(String, Expression, Int, Attribute)]
    for ((dictName, key, level) <- downPairs) {
      val proj = Dictionaries.descendantsClosure(dictName, level).queryExecution.analyzed
      val keyAttr = proj.output.head
      child = Join(child, proj, LeftOuter,
        Some(EqualTo(Cast(key, LongType), keyAttr)),
        JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))
      downJoins :+= ((dictName, key, level, proj.output(1)))
    }
    val emptyChain = Literal.create(Seq.empty[Long], ArrayType(LongType, containsNull = false))

    def substitute(e: Expression): Expression = e.transformUp {
      case g: DictGetExpr =>
        val (_, _, _, attrMap) = resolvedJoins.find { case (d, k, _, _) =>
          d == g.dictName && k.semanticEquals(g.key)
        }.get
        val attr = attrMap(g.attrName)
        g.default match {
          case Some(d) => Coalesce(Seq(attr, d))
          case None    => attr
        }
      case h: DictHasExpr =>
        val (_, _, keyAttr, _) = resolvedJoins.find { case (d, k, _, _) =>
          d == h.dictName && k.semanticEquals(h.key)
        }.get
        IsNotNull(keyAttr)
      case gh: DictGetHierarchyExpr => chainOf(gh.dictName, gh.key)
      case in: DictIsInExpr =>
        Coalesce(Seq(
          ArrayContains(chainOf(in.dictName, in.child), Cast(in.ancestor, LongType)),
          Literal(false)))
      case dd: DictDescendantsExpr =>
        val (_, _, _, attr) = downJoins.find { case (d, k, lv, _) =>
          d == dd.dictName && k.semanticEquals(dd.key) && lv == dd.level
        }.get
        Coalesce(Seq(attr, emptyChain))
    }

    val rewritten = p.withNewChildren(Seq(child)).mapExpressions(substitute)
    if (selfOutputting) rewritten else Project(savedOutput, rewritten)
  }
}
