package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.DataType

/** ClickHouse external-dictionary analog.
  *
  * The reference's migrated apps use dictionaries for in-memory
  * key→attribute lookups inside scans (`dictGet('currencies', 'rate',
  * cur_id)`), avoiding a SQL join in ClickHouse. The Spark-first
  * equivalent of "in-memory replicated lookup table" is a BROADCAST
  * HASH JOIN — same memory model (full copy per node), same probe cost
  * (one hash lookup per row), but planned by Catalyst so it composes
  * with codegen, AQE and column pruning instead of hiding inside a
  * black-box function. [[graft.plans.DictGetRewrite]] performs that
  * rewrite: every `dictGet` call in a query becomes an attribute of a
  * broadcast left-outer join added under the operator that used it.
  *
  * This registry maps dictionary names to their source tables. Sources
  * are thunks so each rewrite gets a FRESH plan (fresh expression ids
  * — the same dictionary can back several joins in one query), and so
  * a dictionary can be registered before its backing table exists.
  * At 100 TB the dictionary is a dim table: broadcast works to ~100s
  * of MB per ClickHouse's own guidance for in-memory dictionaries.
  */
object Dictionaries {

  /** `keyCols.size > 1` models CH's COMPLEX_KEY layouts: the lookup
    * key is a tuple and the broadcast join keys on every column. */
  final case class Dict(keyCols: Seq[String], source: () => DataFrame,
                        parentCol: Option[String] = None) {
    require(keyCols.nonEmpty, "dictionary needs at least one key column")
    def keyCol: String = keyCols.head
    // schema is stable across source() calls (same table); cached
    // because DictGetExpr.dataType is consulted many times per analysis
    private lazy val schema = source().schema
    def attrType(attr: String): DataType =
      schema.find(_.name == attr).getOrElse(
        throw new IllegalArgumentException(
          s"dictionary attribute '$attr' not in [${schema.map(_.name).mkString(", ")}]")
      ).dataType
    def keyType: DataType = attrType(keyCol)
  }

  private val dicts = new ConcurrentHashMap[String, Dict]()

  def exists(name: String): Boolean = dicts.containsKey(name)

  /** Registered dictionaries, for `system.dictionaries`: (name,
    * key column, hierarchical?). Sorted for deterministic output. */
  def list: Seq[(String, String, Boolean)] = {
    val out = scala.collection.mutable.ArrayBuffer[(String, String, Boolean)]()
    dicts.forEach((n, d) =>
      if (!n.startsWith(JoinPrefix)) // Join-engine tables are not dictionaries
        out += ((n, d.keyCols.mkString(", "), d.parentCol.isDefined)))
    out.sortBy(_._1).toSeq
  }

  /** `SYSTEM RELOAD DICTIONARY [name]` — drop cached closure rows so
    * the next use re-reads the source (sources are thunks, so data
    * freshness is already per-plan; this clears the hierarchy walks). */
  def reload(name: Option[String]): Unit = name match {
    case Some(n) =>
      if (!exists(n)) throw new IllegalArgumentException(s"dictionary '$n' does not exist")
      invalidateClosures(n)
    case None =>
      val it = dicts.keys()
      while (it.hasMoreElements) invalidateClosures(it.nextElement())
  }

  // original CREATE DICTIONARY text per name (SHOW CREATE DICTIONARY);
  // Scala-API registrations have no DDL and answer with guidance
  private val ddls = new ConcurrentHashMap[String, String]()
  def recordDdl(name: String, text: String): Unit = ddls.put(name, text)
  def ddlOf(name: String): Option[String] = Option(ddls.get(name))

  /** Remove a dictionary (DROP DICTIONARY); true when it existed. */
  def unregister(name: String): Boolean = {
    invalidateClosures(name)
    ddls.remove(name)
    dicts.remove(name) != null
  }

  def register(name: String, keyCol: String, source: () => DataFrame): Unit =
    registerComplex(name, Seq(keyCol), source)

  /** A COMPLEX_KEY dictionary: the key is the TUPLE of `keyCols`, and
    * lookups pass `tuple(k1, k2, …)`; the broadcast join keys on
    * every column (struct-free, so each equality stays a plain
    * codegen'd comparison). */
  def registerComplex(name: String, keyCols: Seq[String], source: () => DataFrame): Unit = {
    dicts.put(name, Dict(keyCols, source))
    invalidateClosures(name)
    // a re-registration REPLACES the dictionary: a previously-recorded
    // CREATE text no longer describes it (the DDL path re-records
    // AFTER registering, so DDL-created dictionaries keep theirs)
    ddls.remove(name)
  }

  // -- Join-engine tables (`CREATE TABLE … ENGINE = Join(ANY, LEFT,
  // k)`, looked up by `joinGet`). They ride the SAME broadcast-join
  // rewrite as dictionaries, registered under a reserved unprintable
  // prefix so a Join table can never collide with (or be DROPped as)
  // a dictionary, and `system.dictionaries` stays dictionaries-only.

  private val JoinPrefix = "join" + '\u0001'
  // table → (strictness, kind, key columns)
  private val joinMeta = new ConcurrentHashMap[String, (String, String, Seq[String])]()

  /** The internal dictionary name backing a Join-engine table. */
  def joinDictName(table: String): String = JoinPrefix + table

  /** Register a Join-engine table. Only ANY-strictness tables get a
    * lookup source (ClickHouse's joinGet contract is Join(ANY, LEFT,
    * …)); other strictness is recorded so joinGet can refuse with the
    * precise reason rather than "unknown table". */
  def registerJoinTable(table: String, strictness: String, kind: String,
                        keyCols: Seq[String], source: () => DataFrame): Unit = {
    joinMeta.put(table, (strictness, kind, keyCols))
    if (strictness.equalsIgnoreCase("ANY"))
      registerComplex(joinDictName(table), keyCols, source)
  }

  def joinTableMeta(table: String): Option[(String, String, Seq[String])] =
    Option(joinMeta.get(table))

  def unregisterJoinTable(table: String): Boolean = {
    unregister(joinDictName(table))
    joinMeta.remove(table) != null
  }

  /** A HIERARCHICAL dictionary (ClickHouse's `hierarchical` attribute
    * flag): `parentCol` names the parent-key attribute, enabling
    * `dictGetHierarchy` / `dictIsIn`. Keys must be integral (CH
    * requires UInt64 there too). */
  def registerHierarchical(name: String, keyCol: String, parentCol: String,
                           source: () => DataFrame): Unit = {
    dicts.put(name, Dict(Seq(keyCol), source, Some(parentCol)))
    invalidateClosures(name)
    ddls.remove(name) // same replacement contract as registerComplex
  }

  // collected (key, parent) walks cached per dictionary so repeated
  // query analysis doesn't re-collect the source; invalidated on
  // re-register (ClickHouse's dictionary-reload moment). Only ROWS
  // are cached — each rewrite still builds a fresh DataFrame, so
  // every join gets fresh expression ids.
  private val closureRows =
    new ConcurrentHashMap[(String, Int), Seq[(Long, Seq[Long])]]()

  private def invalidateClosures(name: String): Unit = {
    val it = closureRows.keys()
    while (it.hasMoreElements) {
      val k = it.nextElement()
      if (k._1 == name) closureRows.remove(k)
    }
  }

  /** The (key → ancestor chain) closure table for a hierarchical
    * dictionary: one row per key, `gr_h_chain` = [key, parent(key),
    * …] up to the root (parent NULL, missing, or self-referential).
    *
    * Built by collecting the dictionary's (key, parent) pairs to the
    * driver and walking the parent map — the SAME memory envelope as
    * the broadcast join every dictGet already implies (dictionaries
    * are dim-sized by contract; ClickHouse likewise holds the whole
    * hierarchy in RAM on every server). The closure then feeds the
    * standard [[graft.plans.DictGetRewrite]] broadcast-join machinery,
    * so the per-row lookup is one hash probe — never a per-row walk.
    * Cycles fail loudly rather than looping. */
  def hierarchyClosure(name: String): DataFrame = {
    val spark = get(name).source().sparkSession
    val rows = closureRows.computeIfAbsent((name, -1), _ => buildAncestors(name))
    import spark.implicits._
    rows.toDF("gr_h_key", "gr_h_chain")
  }

  /** The dictionary's (key, parent) pairs, collected — bounded by the
    * dictionary size, the same envelope its broadcast join implies. */
  private def collectPairs(name: String): Array[(Long, Option[Long])] = {
    val d = get(name)
    val parentCol = d.parentCol.getOrElse(throw new IllegalArgumentException(
      s"dictionary '$name' is not hierarchical — register with registerHierarchical"))
    d.source().selectExpr(s"CAST(`${d.keyCol}` AS BIGINT)", s"CAST(`$parentCol` AS BIGINT)")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
  }

  private def buildAncestors(name: String): Seq[(Long, Seq[Long])] = {
    val pairs = collectPairs(name)
    val parent = pairs.toMap
    pairs.map { case (k, _) =>
      val chain = scala.collection.mutable.ArrayBuffer(k)
      val seen = scala.collection.mutable.Set(k)
      var cur = parent.get(k).flatten
      while (cur.isDefined && cur.get != chain.last) {
        val c = cur.get
        require(seen.add(c), s"dictionary '$name': hierarchy cycle at key $c")
        chain += c
        cur = parent.get(c).flatten
      }
      (k, chain.toSeq)
    }.toSeq
  }

  /** The downward closure: one row per key, `gr_h_down` = descendants
    * within `maxLevel` parent-hops (maxLevel 0 = unbounded, level 1 =
    * direct children), sorted ascending for determinism (ClickHouse's
    * dictGetChildren/dictGetDescendants leave order internal). Same
    * driver-side envelope and cycle guard as [[hierarchyClosure]]. */
  def descendantsClosure(name: String, maxLevel: Int): DataFrame = {
    require(maxLevel >= 0, s"descendantsClosure maxLevel must be ≥ 0, got $maxLevel")
    val spark = get(name).source().sparkSession
    val rows = closureRows.computeIfAbsent((name, maxLevel), _ => buildDescendants(name, maxLevel))
    import spark.implicits._
    rows.toDF("gr_h_key", "gr_h_down")
  }

  private def buildDescendants(name: String, maxLevel: Int): Seq[(Long, Seq[Long])] = {
    val pairs = collectPairs(name)
    val children = pairs.collect { case (k, Some(p)) if p != k => p -> k }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    pairs.map { case (k, _) =>
      // BFS down, depth-bounded; cycles would re-visit → loud failure
      val seen = scala.collection.mutable.Set(k)
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      var frontier = children.getOrElse(k, Seq.empty)
      var depth = 1
      while (frontier.nonEmpty && (maxLevel == 0 || depth <= maxLevel)) {
        frontier.foreach { c =>
          require(seen.add(c), s"dictionary '$name': hierarchy cycle at key $c")
          out += c
        }
        frontier = frontier.flatMap(c => children.getOrElse(c, Seq.empty))
        depth += 1
      }
      (k, out.sorted.toSeq)
    }.toSeq
  }

  def get(name: String): Dict = {
    val d = dicts.get(name)
    if (d == null) throw new IllegalArgumentException(
      s"unknown dictionary '$name' — registered: [${names.mkString(", ")}]")
    d
  }

  def names: Seq[String] = {
    val it = dicts.keys()
    Iterator.continually(if (it.hasMoreElements) Some(it.nextElement()) else None)
      .takeWhile(_.isDefined).flatten.toSeq.sorted
  }
}
