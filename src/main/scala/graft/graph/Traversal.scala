package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Property predicates — the HugeGraph/TinkerPop `P`/`Text` surface the
  * store contract serves (SURVEY §2.4): eq/gt/gte/lt/lte/between/
  * inside/within/textContains. Each compiles to one Catalyst predicate;
  * the reference instead routed these through its index tables
  * (SECONDARY, RANGE_x, SEARCH — TikvTables.java:176-316).
  */
sealed trait P { def toColumn(c: Column): Column }
object P {
  final case class Eq(v: Any) extends P { def toColumn(c: Column) = c === v }
  final case class Neq(v: Any) extends P { def toColumn(c: Column) = c =!= v }
  final case class Gt(v: Any) extends P { def toColumn(c: Column) = c > v }
  final case class Gte(v: Any) extends P { def toColumn(c: Column) = c >= v }
  final case class Lt(v: Any) extends P { def toColumn(c: Column) = c < v }
  final case class Lte(v: Any) extends P { def toColumn(c: Column) = c <= v }
  /** inclusive-lo, exclusive-hi — TinkerPop `between(a,b)` = a ≤ v < b */
  final case class Between(lo: Any, hi: Any) extends P {
    def toColumn(c: Column) = c >= lo && c < hi
  }
  /** exclusive both ends — TinkerPop `inside(a,b)` = a < v < b */
  final case class Inside(lo: Any, hi: Any) extends P {
    def toColumn(c: Column) = c > lo && c < hi
  }
  /** strict complement of the closed range — TinkerPop `outside(a,b)`
    * = v < a || v > b
    */
  final case class Outside(lo: Any, hi: Any) extends P {
    def toColumn(c: Column) = c < lo || c > hi
  }
  final case class Within(vs: Seq[Any]) extends P {
    def toColumn(c: Column) = c.isin(vs: _*)
  }
  final case class Without(vs: Seq[Any]) extends P {
    def toColumn(c: Column) = !c.isin(vs: _*)
  }
  final case class TextContains(s: String) extends P {
    def toColumn(c: Column) = c.contains(s)
  }
  final case class StartsWith(s: String) extends P {
    def toColumn(c: Column) = c.startsWith(s)
  }
  /** suffix match — TinkerPop `TextP.endingWith`; completes the text
    * predicate battery the SEARCH_INDEX surface accepts
    * (TikvTables.java:203-210). Compiles to codegen'd EndsWith, which
    * Catalyst can't push to Parquet stats (unlike StartsWith) but
    * evaluates in the scan's residual filter — still one pass.
    */
  final case class EndsWith(s: String) extends P {
    def toColumn(c: Column) = c.endsWith(s)
  }
  /** TinkerPop TextP negations — notStartingWith / notEndingWith /
    * notContaining complete the text battery (SQL-null semantics
    * deliberately NOT replicated: a NULL property row is simply not a
    * match either way, same as the positive forms under Catalyst's
    * three-valued logic feeding a filter).
    */
  final case class NotStartsWith(s: String) extends P {
    def toColumn(c: Column) = !c.startsWith(s)
  }
  final case class NotEndsWith(s: String) extends P {
    def toColumn(c: Column) = !c.endsWith(s)
  }
  final case class NotTextContains(s: String) extends P {
    def toColumn(c: Column) = !c.contains(s)
  }
  /** membership in a collection-valued (LIST/SET-cardinality) property —
    * the `supportsQueryWithContains=false` engine-side obligation
    * (TikvFeatures.java:71-74): the store can't evaluate it, so the
    * engine must. Compiles to codegen'd array_contains.
    */
  final case class Contains(v: Any) extends P {
    def toColumn(c: Column) = array_contains(c, v)
  }
  /** key present in the dynamic property bag (map-valued property) —
    * ContainsKey (TikvFeatures.java:76-79).
    */
  final case class ContainsKey(k: String) extends P {
    def toColumn(c: Column) = map_contains_key(c, k)
  }
  /** tokenized SEARCH_INDEX semantics (TikvTables.java:203-210): the
    * index stores whole WORDS, so a hit means some token equals a query
    * word — unlike TextContains, which is substring and matches
    * mid-word. `textContainsAny(ws)` = any query word appears as a
    * token. Case-insensitive, like the reference's analyzer.
    */
  final case class TextContainsAny(words: Seq[String]) extends P {
    def toColumn(c: Column) = arrays_overlap(
      split(lower(c), "\\s+"), array(words.map(w => lit(w.toLowerCase)): _*))
  }
}

/** Gremlin-ish traversal DSL compiled to DataFrame operators.
  *
  * The reference's engine executes a traversal as a loop of indexed KV
  * lookups per hop (R2–R6, TikvTable.java:159-189); here each hop is a
  * *single distributed join* against the edges DataFrame — the central
  * architectural inversion (SURVEY §3.1). Catalyst picks broadcast-hash
  * when the frontier is small (with AQE converting at runtime) and
  * sort-merge otherwise, so one plan scales from 6k rows to 100 TB.
  *
  * Bag semantics (duplicates preserved) match Gremlin; `dedup()` is
  * explicit, as is input-order preservation (the reference's
  * supportsQuerySortByInputIds, TikvFeatures.java:61-64).
  *
  * The frontier DataFrame always carries the full vertex/edge row;
  * Catalyst column pruning drops unused property columns, so this
  * costs nothing over an id-only frontier.
  */
final case class Traversal(g: PropertyGraph, df: DataFrame, isEdge: Boolean) {
  import Traversal._

  private def requireV(): Unit =
    require(!isEdge, "vertex step applied to edge frontier")
  private def requireE(): Unit =
    require(isEdge, "edge step applied to vertex frontier")

  private def hasPath: Boolean = df.columns.contains(PATH)

  /** enable Gremlin path() tracking: subsequent hops append the
    * visited vertex id to a `path` array carried WITH the frontier —
    * distributed, never driver-side.
    */
  def withPath: Traversal = {
    requireV()
    copy(df = df.withColumn(PATH, array(col("id"))))
  }

  /** terminal: tracked paths as array<long> rows (bag semantics — one
    * row per distinct edge walk, like Gremlin path()).
    */
  def paths: DataFrame = {
    require(hasPath, "call withPath before traversing to track paths")
    df.select(col(PATH).as("path"))
  }

  /** terminal: Gremlin path().by(key) — each tracked path element
    * rendered by property `key` instead of id. One posexplode of the
    * id path (map-side), ONE join against the vertex table's (id, key)
    * projection, re-assembled in position order per walk. Missing
    * properties render as null, like TinkerPop's by() on an absent
    * key-less element would fail — here the relational NULL is the
    * honest distributed answer.
    */
  def pathsBy(key: String): DataFrame = {
    require(hasPath, "call withPath before traversing to track paths")
    val lk = g.vertices.select(col("id").as("__pid"), col(key).as("__pv"))
    df.select(monotonically_increasing_id().as("__walk"), col(PATH))
      .select(col("__walk"), posexplode(col(PATH)).as(Seq("__pos", "__pid")))
      .join(lk, Seq("__pid"), "left")
      .groupBy(col("__walk"))
      .agg(transform(
        array_sort(collect_list(struct(col("__pos"), col("__pv")))),
        e => e("__pv")).as("path"))
      .select(col("path"))
  }

  /** terminal: Gremlin tree() — the traversal tree as a FLAT relation.
    * TinkerPop materializes a nested map on the driver; the
    * distributed rendering is its edge list: every (parent, child)
    * link that appears at depth d in ANY tracked path, deduped — the
    * exact information content of the nested form, join-able and
    * unbounded-scale (a nested driver map dies at the first 100M-leaf
    * tree). One explode over the path arrays (map-side) + one
    * distinct shuffle on (depth, parent, child).
    */
  def treeEdges(): DataFrame = {
    require(hasPath, "call withPath before traversing to build tree()")
    df.select(posexplode(slice(col(PATH), 2, Int.MaxValue))
        .as(Seq("__i", "child")),
        col(PATH))
      .select((col("__i") + 1).cast("int").as("depth"),
        element_at(col(PATH), col("__i") + 1).as("parent"),
        col("child"))
      .distinct()
  }

  def hasLabel(ls: String*): Traversal =
    copy(df = df.filter(col("label").isin(ls: _*)))

  def has(key: String, p: P): Traversal = copy(df = df.filter(p.toColumn(col(key))))
  def has(key: String, value: Any): Traversal = has(key, P.Eq(value))

  /** out-edges of the frontier (EDGE_OUT prefix scan analog,
    * TikvTables.java:128-143): join frontier ids to edges on src.
    *
    * Column references are name-based only (the frontier side is
    * reduced to a single uniquely-named id column) so repeated hops —
    * self-joins of the same edges/vertices DataFrames — resolve
    * unambiguously.
    */
  private def tagCols: Seq[Column] =
    df.columns.filter(_.startsWith(TAG)).map(col).toSeq

  private def frontierCols: Seq[Column] =
    (if (hasPath) Seq(col("id").as(FRONT), col(PATH))
     else Seq(col("id").as(FRONT))) ++ tagCols

  def outE(ls: String*): Traversal = {
    requireV()
    val e = filterEdges(g.edges, ls).withColumn(OTHER, col("dst"))
    val res = df.select(frontierCols: _*).join(e, col(FRONT) === col("src"))
    Traversal(g, res, isEdge = true)
  }

  /** in-edges (EDGE_IN analog): joined on dst against the dst-clustered
    * edge copy when the graph carries one (dual bucketed storage), the
    * single frame otherwise — semantics identical either way.
    */
  def inE(ls: String*): Traversal = {
    requireV()
    val e = filterEdges(g.edgesForDst, ls).withColumn(OTHER, col("src"))
    val res = df.select(frontierCols: _*).join(e, col(FRONT) === col("dst"))
    Traversal(g, res, isEdge = true)
  }

  /** union of out and in — the dual-table `both()` shape; an undirected
    * edge traversed from both ends appears twice, as in the reference.
    */
  def bothE(ls: String*): Traversal = {
    requireV()
    val o = outE(ls: _*)
    val i = inE(ls: _*)
    Traversal(g, o.df.union(i.df), isEdge = true)
  }

  /** move from edge frontier to the far-end vertex. */
  def otherV: Traversal = toVertex(OTHER)
  def inV: Traversal = toVertex("dst")
  def outV: Traversal = toVertex("src")

  private def toVertex(end: String): Traversal = {
    requireE()
    val keep = (if (hasPath) Seq(col(end).as(HOP), col(PATH))
                else Seq(col(end).as(HOP))) ++ tagCols
    val joined = df.select(keep: _*).join(g.vertices, col(HOP) === col("id")).drop(HOP)
    val res = if (hasPath)
      joined.withColumn(PATH, concat(col(PATH), array(col("id"))))
    else joined
    Traversal(g, res, isEdge = false)
  }

  def out(ls: String*): Traversal = outE(ls: _*).otherV
  def in(ls: String*): Traversal = inE(ls: _*).otherV
  def both(ls: String*): Traversal = bothE(ls: _*).otherV

  /** Gremlin repeat(out(...)).times(n): n-hop expansion as n chained
    * joins — each hop stays one distributed join (no driver loop).
    */
  def repeat(n: Int)(step: Traversal => Traversal): Traversal =
    (1 to n).foldLeft(this)((t, _) => step(t))

  /** Gremlin repeat(...).emit().times(n): the BAG UNION of every
    * round's frontier (each round emitted, not just the last). Still n
    * chained joins — the union adds no shuffle, and Catalyst shares
    * the common prefix of the per-round plans.
    */
  def repeatEmit(n: Int)(step: Traversal => Traversal): Traversal = {
    require(n >= 1, "repeatEmit needs at least one round")
    var cur = this
    var acc: Option[DataFrame] = None
    for (_ <- 1 to n) {
      cur = step(cur)
      acc = Some(acc.map(_.unionByName(cur.df)).getOrElse(cur.df))
    }
    Traversal(g, acc.get, cur.isEdge)
  }

  /** Gremlin simplePath(): keep only walks that never revisit a
    * vertex — a per-row codegen'd filter over the tracked path array
    * (size(distinct) = size), zero shuffle. Requires [[withPath]]
    * tracking, exactly like paths().
    */
  def simplePath(): Traversal = {
    require(hasPath, "call withPath before traversing to use simplePath")
    copy(df = df.filter(
      size(array_distinct(col(PATH))) === size(col(PATH))))
  }

  /** Gremlin cyclicPath(): the complement — keep only walks that DID
    * revisit a vertex (ring/cycle detection). Same zero-shuffle filter.
    */
  def cyclicPath(): Traversal = {
    require(hasPath, "call withPath before traversing to use cyclicPath")
    copy(df = df.filter(
      size(array_distinct(col(PATH))) < size(col(PATH))))
  }

  /** Gremlin repeat(step).until(frontier empty) — variable-depth
    * expansion to a fixed point (reachability / unbounded repeats the
    * hugegraph engine runs over this store). Result = every vertex
    * reached at depth ≥ 1, dedup'd.
    *
    * Shape per round: one distributed join (the step) + one anti-join
    * against the visited set; `localCheckpoint` truncates the growing
    * lineage so round N doesn't replay rounds 1..N-1 (on a real
    * cluster with an HDFS checkpoint dir, `checkpoint` — same call
    * shape). Only the emptiness TEST touches the driver — frontiers
    * and the visited set stay distributed, so this is BFS with
    * O(diameter) rounds, not a driver loop over rows. `maxDepth` caps
    * runaway cycles (safety net, not semantics — visited-exclusion
    * already terminates any finite graph).
    */
  def repeatUntil(step: Traversal => Traversal, maxDepth: Int = 50): Traversal = {
    requireV()
    // query-shape guard: the fixed point dedups by VERTEX, so it
    // cannot carry a per-origin marker — running inside a filter
    // context (where/not/choose, detected by the internal SFO rider)
    // would silently route EVERY origin to the same verdict; refuse
    // with the real reason instead of the opaque unresolved-column
    // error the enclosing semi-join would throw. USER riders
    // (path()/as() tags) are simply consumed — the barrier ends
    // per-traverser history, exactly as fold() does — and the parser
    // front-end gives clean positional errors when a LATER step would
    // have needed them.
    requireNotFilterContext("repeat().until()")
    // BFS state is ID-ONLY: frontiers, the visited set, and the reached
    // accumulator are narrow long columns, so every per-round shuffle,
    // dedup, and checkpoint moves 8-byte keys, not full property rows
    // (measured 3× on the reachability gate query). Vertex rows are
    // reconstructed per round by a semi-join (broadcast when the
    // frontier is small — AQE's call) and once more for the result.
    // The vertex/edge relations are re-joined EVERY round — cache them
    // for the loop (exactly why GraphX caches its graph): without this
    // each round re-runs the full derivation (for the TPC-H view that
    // includes a lineitem distinct per round). MEMORY_AND_DISK spills
    // rather than OOMs on big graphs. Frames the CALLER already cached
    // are left alone (unpersisting them here would silently drop the
    // caller's cache); frames persisted here are released in the
    // finally — blocking, so repeated or failing invocations never
    // stack copies — and the result is rebuilt against the original
    // vertices so it stays valid afterwards.
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val none = org.apache.spark.storage.StorageLevel.NONE
    // Persist ONLY the edge relation for the loop: it hides real work
    // (the TPC-H view has a lineitem distinct) that would otherwise
    // re-run every round. The vertex relation is a shuffle-free union
    // of column-pruned parquet scans — re-scanning it per round costs
    // less than one eager build of the full wide cache (arrays/maps
    // for ~1M rows), which dominated the gate query's wall-clock.
    val ownE = g.edges.storageLevel == none
    // swap the wide vertex union for a cached narrow (id, label) frame
    // when the step provably never reads a vertex property — the
    // in-loop joins are then one InMemoryTableScan instead of a
    // 6-scan union re-derived (and re-broadcast) every round; the
    // result hydration below still uses the ORIGINAL wide vertices.
    // The loop's own edge cache is likewise pruned to (src, dst,
    // label) when no edge property is referenced.
    val ownV = !stepReferencesVertexProps(Seq(step))
    val loopV = if (ownV) narrowLoopVertices(level) else g.vertices
    val loopE =
      if (!ownE) g.edges
      else if (stepNeedsEdgeProps(Seq(step))) g.edges.persist(level)
      else g.edges.select(col("src"), col("dst"), col("label")).persist(level)
    val gc = PropertyGraph(
      loopV,
      loopE,
      g.edgesByDst) // table-backed when present — cheap to rescan
    try {
      var frontierIds = df.select(col("id")).dropDuplicates("id").localCheckpoint()
      var visited = frontierIds
      var reached: Option[DataFrame] = None
      var depth = 0
      while (depth < maxDepth && !frontierIds.isEmpty) {
        val frontierV = gc.vertices.join(frontierIds, Seq("id"), "left_semi")
        val stepped = step(Traversal(gc, frontierV, isEdge = false))
        require(!stepped.isEdge, "repeatUntil step must end on a vertex frontier")
        val nextIds = stepped.df.select(col("id")).dropDuplicates("id")
          .join(visited, Seq("id"), "left_anti")
          .localCheckpoint()
        reached = Some(reached.map(_.union(nextIds)).getOrElse(nextIds))
        visited = visited.union(nextIds)
        frontierIds = nextIds
        depth += 1
      }
      // the no-new-vertices fixed point not reached inside the cap is
      // a truncated answer, not an answer (ADVICE r13) — refuse loudly
      if (!frontierIds.isEmpty)
        throw new IllegalStateException(
          s"repeat().until(count().is(0)) did not reach its fixed point " +
            s"within maxDepth=$maxDepth rounds — raise maxDepth (DSL " +
            "repeatUntil parameter) or bound the walk with times(n)")
      val ids = reached.getOrElse(df.limit(0).select(col("id")))
      copy(df = g.vertices.join(ids, Seq("id"), "left_semi"))
    } finally {
      if (ownE) loopE.unpersist(blocking = true)
      if (ownV) loopV.unpersist(blocking = true)
    }
  }

  /** the whole-frontier fixed points cannot run inside a per-origin
    * context: they dedup by VERTEX, so every origin would collapse to
    * one verdict. Detected by the SFO rider (where/not/choose) or the
    * FCTX marker (coalesce/optional/local/project sub-traversals —
    * those track origins via PATH/tag columns the barrier would
    * consume, surfacing as an opaque unresolved-column error without
    * this check).
    */
  private def requireNotFilterContext(what: String): Unit =
    require(!df.columns.contains(SFO) && !df.columns.contains(FCTX),
      s"$what is a whole-frontier fixed point that dedups by vertex — " +
        "it cannot run inside where()/not()/choose()/coalesce()/" +
        "optional()/local()/project() sub-traversals; use " +
        "repeat().times(n) there")

  /** Does any of the given sub-traversals reference a vertex PROPERTY
    * column (anything beyond id/label)? Decides whether the BFS loops
    * may swap the wide vertex union for a narrow cached (id, label)
    * frame (r15 plan audit: the per-round semi-join was pushed below
    * the 6-branch vertex Union — 6 SortMergeJoins + 12 Exchanges per
    * round — and the otherV hydration broadcast-rebuilt the whole
    * union from parquet EVERY round). Analysis-only: the probe plans
    * are built against the real graph but never executed. Name-based
    * and conservative — a shared name (e.g. the edge column
    * `orderdate`) or any probe failure keeps the wide frame, which is
    * always correct, just slower.
    */
  private def stepReferencesVertexProps(
      fns: Seq[Traversal => Traversal]): Boolean =
    stepRefNames(fns) match {
      case Some(refs) =>
        refs.intersect(g.vertices.columns.toSet -- Set("id", "label")).nonEmpty
      case None => true
    }

  /** All column names the given sub-traversals' analyzed plans
    * reference, or None when a probe plan cannot be built (unknown
    * shape — callers fall back to the conservative wide frames).
    * Analysis-only: nothing is executed.
    */
  private def stepRefNames(
      fns: Seq[Traversal => Traversal]): Option[Set[String]] =
    try {
      val probe = Traversal(g, g.vertices, isEdge = false)
      Some(fns.flatMap { fn =>
        fn(probe).df.queryExecution.analyzed.collect {
          case p => p.expressions.flatMap(_.collect {
            case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
              a.name
          })
        }.flatten
      }.toSet)
    } catch { case _: Throwable => None }

  /** May the loop's edge cache drop the edge PROPERTY columns
    * (everything beyond src/dst/label)? Same introspection contract
    * as [[stepReferencesVertexProps]]: the cache build then writes
    * 3 narrow columns instead of 8 (the lineitem-backed `contains`
    * branch carries 4 otherwise-unused property columns through the
    * union), shrinking both the one-time materialization and every
    * per-round scan. Conservative on shared names and probe failure.
    */
  private def stepNeedsEdgeProps(fns: Seq[Traversal => Traversal]): Boolean =
    stepRefNames(fns) match {
      case Some(refs) =>
        refs.intersect(g.edges.columns.toSet -- Set("src", "dst", "label")).nonEmpty
      case None => true
    }

  /** The narrow in-loop vertex frame: (id, label) only, shuffled onto
    * the session's id-hash layout and sorted so every per-round join
    * streams the cache with NO exchange and NO re-sort (the cached
    * plan's partitioning/ordering survive InMemoryTableScan), and the
    * round's dedup + visited anti-join inherit the id partitioning.
    */
  private def narrowLoopVertices(
      level: org.apache.spark.storage.StorageLevel): DataFrame =
    g.vertices.select(col("id"), col("label"))
      .repartition(col("id")).sortWithinPartitions("id")
      .persist(level)

  /** Gremlin repeat(step).until(predicate) — the TARGET-REACHED stop
    * (`repeat(out()).until(hasId(x) | has('k',v) | hasLabel('l'))`):
    * BFS like [[repeatUntil]], but after each round the NEW frontier is
    * tested against the stop sub-traversal — a traverser for which it
    * yields ANY result HALTS and is emitted; the rest keep expanding.
    * TinkerPop's post-check semantics (until after repeat tests AFTER
    * each body execution, so depth-0 start vertices are not tested).
    * Result = every halted vertex, dedup'd; visited-exclusion both
    * terminates cycles and keeps the per-round state id-only, exactly
    * as in [[repeatUntil]] (the reference engine serves this as a
    * conditional per-hop scan loop over R2–R9, TikvTable.java:30-58).
    *
    * Scale shape per round: the step's distributed join + one
    * anti-join against visited + the stop test — a semi-join of the
    * (small) new frontier against the stop sub-traversal's origins,
    * narrow ids throughout. Only the emptiness test touches the
    * driver. The stop sub-traversal may itself hop (until(__.out('x'))
    * = "stop when a vertex HAS an x-neighbor"): [[where]] semantics,
    * one shared distributed subplan per round.
    *
    * `emitAll = true` is `repeat().emit().until(<predicate>)` (r13
    * verdict task 5): EVERY vertex reached at depth ≥ 1 is emitted —
    * the halted ∪ expanded union the loop already tracks — while the
    * stop predicate still prunes expansion (a halted vertex's
    * neighbors are not explored through it). Same per-round plan; the
    * only change is WHICH accumulator feeds the result.
    */
  def repeatUntilReached(step: Traversal => Traversal,
      stop: Traversal => Traversal, maxDepth: Int = 50,
      emitAll: Boolean = false): Traversal = {
    requireV()
    requireNotFilterContext("repeat().until(predicate)")
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val none = org.apache.spark.storage.StorageLevel.NONE
    val ownE = g.edges.storageLevel == none
    // narrow in-loop vertices / pruned edge cache when neither the
    // step nor the stop predicate reads the property columns — see
    // repeatUntil
    val probeFns = Seq(step, (t: Traversal) => t.where(stop))
    val ownV = !stepReferencesVertexProps(probeFns)
    val loopV = if (ownV) narrowLoopVertices(level) else g.vertices
    val loopE =
      if (!ownE) g.edges
      else if (stepNeedsEdgeProps(probeFns)) g.edges.persist(level)
      else g.edges.select(col("src"), col("dst"), col("label")).persist(level)
    val gc = PropertyGraph(
      loopV,
      loopE,
      g.edgesByDst)
    try {
      // The stop verdict is PER-VERTEX and frontier-independent: the
      // sub-traversal sees one fresh traverser (PATH = [id]) per
      // candidate, so whether it yields anything depends only on the
      // (constant) graph. Evaluating it ONCE over all vertices and
      // semi-joining each round's new frontier replaces the per-round
      // where() subplan — for a hop stop that was 2-3 joins plus
      // their broadcast builds EVERY round (r15 JobProbe: the g66
      // hop-stop rounds carried ~20 broadcast-future jobs each).
      val stopSet = Traversal(gc, gc.vertices, isEdge = false)
        .where(stop).df.select(col("id")).localCheckpoint()
      var frontierIds = df.select(col("id")).dropDuplicates("id").localCheckpoint()
      var visited = frontierIds
      var halted: Option[DataFrame] = None
      var depth = 0
      while (depth < maxDepth && !frontierIds.isEmpty) {
        val frontierV = gc.vertices.join(frontierIds, Seq("id"), "left_semi")
        val stepped = step(Traversal(gc, frontierV, isEdge = false))
        require(!stepped.isEdge,
          "repeatUntilReached step must end on a vertex frontier")
        val nextIds = stepped.df.select(col("id")).dropDuplicates("id")
          .join(visited, Seq("id"), "left_anti")
          .localCheckpoint()
        // LAZY like frontierIds: a depth-1 semi-join over two
        // checkpointed frames — no per-round stop job at all
        val stopIds = nextIds.join(stopSet, Seq("id"), "left_semi")
        val emitted = if (emitAll) nextIds else stopIds
        halted = Some(halted.map(_.union(emitted)).getOrElse(emitted))
        visited = visited.union(nextIds)
        // LAZY: both inputs are already checkpointed, so the anti-join
        // is a depth-1 plan over cached blocks — its two evaluations
        // (the emptiness test + the next round's semi-join) cost less
        // than the third checkpoint job per round this used to run
        frontierIds = nextIds.join(stopSet, Seq("id"), "left_anti")
        depth += 1
      }
      // a target deeper than maxDepth must not silently vanish from
      // the result (ADVICE r13): surface the truncated fixed point
      if (!frontierIds.isEmpty)
        throw new IllegalStateException(
          s"repeat().until(<predicate>) still had live traversers after " +
            s"maxDepth=$maxDepth rounds — the stop target may be deeper " +
            "than the cap; raise maxDepth (DSL repeatUntilReached " +
            "parameter) or bound the walk with times(n)")
      val ids = halted.getOrElse(df.limit(0).select(col("id")))
      copy(df = g.vertices.join(ids, Seq("id"), "left_semi"))
    } finally {
      if (ownE) loopE.unpersist(blocking = true)
      if (ownV) loopV.unpersist(blocking = true)
    }
  }

  /** Gremlin union(t1, t2, …): bag union of every branch applied to
    * this frontier — one plan-level Union of the branch joins, no
    * extra shuffle beyond what the branches themselves do.
    */
  def union(subs: (Traversal => Traversal)*): Traversal = {
    requireV()
    val dfs = subs.map { s =>
      val r = s(this)
      require(!r.isEdge, "union branches must end on a vertex frontier")
      r.df
    }
    copy(df = dfs.reduce(_ unionByName _))
  }

  /** Gremlin coalesce(t1, t2, …): per start vertex, the results of the
    * FIRST branch that yields anything. Origins ride the frontier as a
    * column (the reference's engine evaluates branch-by-branch per
    * traverser; here every branch runs as one distributed plan and a
    * min-branch aggregate picks each origin's winner — two narrow
    * shuffles on origin ids). Distinct frontier origins only; does not
    * compose with withPath.
    */
  def coalesce(subs: (Traversal => Traversal)*): Traversal = {
    requireV()
    require(!hasPath, "coalesce does not compose with withPath")
    val tagged = copy(df = df.withColumn(PATH, array(col("id")))
      .withColumn(FCTX, lit(true)))
    val vcols = g.vertices.columns
    val branches = subs.zipWithIndex.map { case (s, i) =>
      val r = s(tagged)
      require(!r.isEdge, "coalesce branches must end on a vertex frontier")
      r.df.select((vcols.map(col) :+ element_at(col(PATH), 1).as(ORIGIN) :+
        lit(i).as(BRANCH)): _*)
    }
    val all = branches.reduce(_ unionByName _)
    val winners = all.groupBy(col(ORIGIN))
      .agg(min(col(BRANCH)).as("__winner"))
      .select(col(ORIGIN).as("__worigin"), col("__winner"))
    val res = all
      .join(winners, col(ORIGIN) === col("__worigin") &&
        col(BRANCH) === col("__winner"))
      .select(vcols.map(col): _*)
    copy(df = res)
  }

  /** Gremlin optional(t): t's results where t produces any, the
    * incoming vertex itself otherwise.
    */
  def optional(sub: Traversal => Traversal): Traversal =
    coalesce(sub, identity)

  /** Gremlin local(sub-with-limit) — LOCAL-scope top-k: the trailing
    * limit (optionally preceded by order(k[, dir])) applies PER
    * ORIGIN TRAVERSER, not globally (TinkerPop's per-vertex
    * top-k-neighbors idiom). The origin rides the frontier as one
    * 8-byte tag column through the sub's hops; the scoped limit is a
    * single row_number window partitioned by origin — ONE shuffle on
    * origin ids, the canonical distributed per-group top-k (no
    * per-traverser execution). Ties (and the unordered form) break by
    * frontier id, keeping the result a pure function of the data —
    * Gremlin's unordered contract made deterministic, same stance as
    * [[sample]]. Nested local() is rejected (the origin tag is one
    * reserved slot).
    */
  def localLimit(sub: Traversal => Traversal, n: Int,
                 orderKey: String = "", asc: Boolean = true): Traversal = {
    requireV()
    require(n >= 1, "local limit must be >= 1")
    val lk = "__local_origin"
    require(!df.columns.contains(TAG + lk), "nested local() not supported")
    val tagged = as(lk)
    val r = sub(tagged.copy(df = tagged.df.withColumn(FCTX, lit(true))))
    require(!r.isEdge, "local sub must end on a vertex frontier")
    val ord: Seq[Column] =
      (if (orderKey.isEmpty) Nil
       else Seq(if (asc) col(orderKey).asc else col(orderKey).desc)) :+
        col("id").asc
    val w = Window.partitionBy(col(TAG + lk)).orderBy(ord: _*)
    copy(df = r.df
      .withColumn("__lrn", row_number().over(w))
      .filter(col("__lrn") <= n)
      .drop("__lrn", TAG + lk, FCTX))
  }

  /** Gremlin match(patterns…) — conjunctive pattern matching as a
    * RELATIONAL JOIN, the semantics TinkerPop's MatchStep approximates
    * with per-traverser backtracking. Each pattern
    * `__.as('a').steps.as('b')` compiles to one binary relation
    * R(a, b): the steps run ONCE, distributed, from the full vertex
    * set with the start variable riding as a tag; the match is then
    * the natural join of all pattern relations (shared variable names
    * are the join keys — Catalyst reorders the join tree, which IS the
    * query planning TinkerPop does by hand), semi-joined with the
    * incoming frontier on `first`. Bindings are DISTINCT (set
    * semantics — the relational reading of a conjunctive query);
    * output has one column per variable, holding vertex ids.
    *
    * Every pattern must share at least one variable with the bindings
    * accumulated so far (left-to-right), so a typo'd variable can't
    * silently turn the match into a cross product.
    */
  def matchPatterns(first: String,
      patterns: (String, Traversal => Traversal, String)*): DataFrame = {
    requireV()
    require(patterns.nonEmpty, "match needs at least one pattern")
    val mk = "__match_start"
    var bound = df.select(col("id").as(first)).distinct()
    patterns.foreach { case (sv, sub, ev) =>
      require(sv != ev, s"pattern binds '$sv' to itself")
      val r = sub(Traversal(g, g.vertices, isEdge = false).as(mk))
      require(!r.isEdge, "match patterns must end on a vertex frontier")
      require(r.df.columns.contains(TAG + mk),
        s"pattern ($sv)->($ev) lost its binding tag — a whole-frontier " +
          "barrier (fold/repeat().until()) cannot appear inside match()")
      val rel = r.df.select(col(TAG + mk).as(sv), col("id").as(ev)).distinct()
      val shared = bound.columns.toSet.intersect(Set(sv, ev)).toSeq.sorted
      require(shared.nonEmpty,
        s"pattern ($sv)->($ev) shares no variable with ${bound.columns.mkString(",")}")
      bound = bound.join(rel, shared)
    }
    bound.select(bound.columns.sorted.map(col): _*)
  }

  /** Gremlin choose(cond, onTrue, onFalse) — the per-traverser
    * conditional branch (TinkerPop's traversal-predicate form: a
    * frontier row routes to `onTrue` when `cond` yields ANY result
    * from it, to `onFalse` otherwise). The cond sub-traversal's
    * origin-id set is ONE shared subplan (exchange reuse executes it
    * once per action; construction stays job-free and nothing is
    * cached), feeding both a semi and an anti join; the result is a plan-level
    * Union of the branch subtrees — no per-row dispatch anywhere, and
    * an expensive cond executes once, not once per side. The 2-arg
    * Gremlin form is `onFalse = identity` (non-matching travellers
    * pass through).
    */
  /** CALLER CONTRACT (user-facing, not just a code comment — ADVICE
    * r12): the exact true/false partition relies on the semi and anti
    * join evaluating ONE shared cond subplan. That holds via exchange
    * reuse for deterministic conds; a cond whose result set is
    * ORDER-NONDETERMINISTIC (limit/range/skip without a total order
    * inside the cond) could route a row to both branches or neither if
    * the subplan were ever evaluated twice. Pass `pinCond = true` for
    * such conds — the cond's origin set is then materialized once via
    * localCheckpoint (one extra job) and the partition is exact by
    * construction. The string front-end detects those steps and sets
    * the pin automatically; the pin is also forced whenever
    * spark.sql.exchange.reuse is disabled.
    */
  def choose(cond: Traversal => Traversal,
             onTrue: Traversal => Traversal,
             onFalse: Traversal => Traversal = identity,
             pinCond: Boolean = false): Traversal = {
    requireV()
    val origin = copy(df = df
      .withColumn(PATH, array(col("id")))
      .withColumn(SFO, col("id")))
    // SHARED, UNCACHED: the semi and anti join reference the identical
    // distinct subplan, whose boundary is an exchange (shuffle for the
    // aggregate, or a broadcast of the small reached set) — Spark's
    // exchange reuse executes it ONCE per action, so an expensive cond
    // does not run per side, with no cache entry to leak and no job at
    // construction (an eager pin cost a distributed job just to BUILD
    // the query; a persist leaked a CacheManager entry per choose()
    // for the life of the session). The pin (see scaladoc) is the
    // opt-in hard guarantee for nondeterministic conds and the
    // fallback when exchange reuse is off.
    val shared = cond(origin).df
      .select(col(SFO).as("__origin"))
      .distinct()
    val reuseOn =
      try df.sparkSession.conf.get("spark.sql.exchange.reuse", "true").toBoolean
      catch { case _: Throwable => true }
    val reached = if (pinCond || !reuseOn) shared.localCheckpoint() else shared
    val tb = onTrue(copy(df =
      df.join(reached, col("id") === col("__origin"), "left_semi")))
    val fb = onFalse(copy(df =
      df.join(reached, col("id") === col("__origin"), "left_anti")))
    require(!tb.isEdge && !fb.isEdge,
      "choose branches must end on a vertex frontier")
    copy(df = tb.df.unionByName(fb.df))
  }

  /** Gremlin project('a','b',…).by(…) terminal: one output row per
    * frontier row, one column per label. A by-clause is either a
    * property key (a plain column rename) or a per-traverser
    * sub-traversal COUNT (`__.out(…).count()` — the high-traffic form:
    * name-plus-degree readouts). Each count clause is one
    * origin-grouped aggregate over the sub-traversal's distributed
    * run, left-joined back on the frontier id (0 where the sub reaches
    * nothing) — per-traverser semantics without per-row execution.
    * Like [[coalesce]], sub-clauses key on the frontier id: distinct
    * frontier origins only.
    */
  def project(fields: (String, Traversal.ProjectBy)*): DataFrame = {
    requireV()
    require(fields.nonEmpty, "project needs at least one field")
    var cur = df
    fields.foreach {
      case (l, Traversal.BySubCount(sub)) =>
        val origin = copy(df = df.withColumn(PATH, array(col("id")))
          .withColumn(FCTX, lit(true)))
        val pid = s"__pid_$l"
        val cnt = sub(origin).df
          .groupBy(element_at(col(PATH), 1).as(pid))
          .agg(org.apache.spark.sql.functions.count(lit(1)).as(s"__cnt_$l"))
        cur = cur.join(cnt, col("id") === col(pid), "left").drop(pid)
          .withColumn(s"__cnt_$l", org.apache.spark.sql.functions
            .coalesce(col(s"__cnt_$l"), lit(0L)))
      case _ => ()
    }
    cur.select(fields.map {
      case (l, Traversal.ByKey(k)) => col(k).as(l)
      case (l, Traversal.BySubCount(_)) => col(s"__cnt_$l").as(l)
    }: _*)
  }

  /** filter frontier by vertex/edge ids. */
  def hasId(ids: Long*): Traversal = {
    requireV()
    copy(df = df.filter(col("id").isin(ids: _*)))
  }

  /** deterministic sample: hash-bucket of the id — stable across runs
    * and engines, unlike rand().
    */
  def sample(denominator: Int, bucket: Int = 0): Traversal = {
    val key = if (isEdge) xxhash64(col("src"), col("dst"), col("label"))
    else xxhash64(col("id"))
    copy(df = df.filter(pmod(key, lit(denominator)) === bucket))
  }

  /** terminal: Gremlin valueMap — id plus the requested properties. */
  def valueMap(keys: String*): DataFrame = {
    requireV()
    df.select((Seq(col("id")) ++ keys.map(col)): _*)
  }

  /** terminal: Gremlin elementMap — id AND label plus the requested
    * properties (the valueMap variant TinkerPop 3.4+ corpora reach for
    * first). Vertex frontiers only: edges here have no surrogate id
    * (identified by (src, label, sort_key, dst), like the reference's
    * binary edge ids) — same clean shape error as id().
    */
  def elementMap(keys: String*): DataFrame = {
    require(!isEdge,
      "elementMap() needs a vertex frontier; edges are identified by " +
        "(src, label, sort_key, dst) — select those explicitly")
    df.select((Seq(col("id"), col("label")) ++ keys.map(col)): _*)
  }

  /** Gremlin coin(p) — keep each traverser with probability p. Like
    * [[sample]], randomness is replaced by a DETERMINISTIC hash coin
    * (md5 bucket of the element identity, threshold p·10⁴): stable
    * across runs AND engines (a SQL oracle replays the md5 arithmetic
    * exactly), which is the only reproducible reading of TinkerPop's
    * unordered contract in a distributed engine.
    */
  def coin(p: Double): Traversal = {
    require(p >= 0.0 && p <= 1.0, "coin(p) needs 0 <= p <= 1")
    val key =
      if (isEdge) concat_ws("|", col("src"), col("dst"), col("label"),
        col("sort_key"))
      else col("id").cast("string")
    val bucket = conv(substring(md5(key), 1, 8), 16, 10).cast("long") % 10000L
    copy(df = df.filter(bucket < lit(math.round(p * 10000))))
  }

  /** terminal: Gremlin id() — the frontier's vertex ids (bag). Edge
    * frontiers have no surrogate id in this store (edges are identified
    * by (src, label, sort_key, dst), like the reference's binary edge
    * ids); a clean shape error beats a missing-column crash.
    */
  def idsDF(): DataFrame = {
    require(!isEdge,
      "id() needs a vertex frontier; edges are identified by " +
        "(src, label, sort_key, dst) — select those explicitly")
    df.select(col("id"))
  }

  /** terminal: Gremlin label() — element labels (bag); both frontier
    * kinds carry a label column.
    */
  def labelsDF(): DataFrame = df.select(col("label"))

  /** Gremlin fold(): the frontier's id bag as ONE sorted-list row.
    * A global barrier by definition (TinkerPop folds all traversers
    * into a single list traverser); sorting replaces TinkerPop's
    * arrival order — unspecified under parallel iteration — with a
    * deterministic one. Scale note: the list is O(frontier) driver-less
    * but single-reducer, exactly as costly as the semantics demand;
    * fold of an unbounded frontier is the same user error here as in
    * TinkerPop.
    */
  def foldIds(): DataFrame = {
    requireV()
    // fold() collapses the frontier to ONE id-list traverser: user
    // path()/as() riders are consumed here (the barrier ends
    // per-traverser history — a path filter applied BEFORE the fold
    // has already done its work and folds fine); the parser gives a
    // clean positional error when a step AFTER the barrier would have
    // needed the lost history.
    df.agg(sort_array(collect_list(col("id"))).as("ids"))
  }

  /** terminal: Gremlin groupCount().by(key). */
  def groupCount(key: String): DataFrame =
    df.groupBy(col(key))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("cnt"))

  /** Gremlin where(traversal): keep frontier rows for which the
    * sub-traversal produces at least one result — a LEFT SEMI join
    * (the reference's engine runs the inner traversal per row; here
    * it's one distributed semi-join).
    */
  def where(sub: Traversal => Traversal): Traversal =
    semiFilter(sub, anti = false)

  /** Gremlin not(traversal): LEFT ANTI counterpart. */
  def not(sub: Traversal => Traversal): Traversal =
    semiFilter(sub, anti = true)

  private def semiFilter(sub: Traversal => Traversal, anti: Boolean): Traversal = {
    requireV()
    // run the sub-traversal from the full frontier: the SFO tag rider
    // marks each row's origin (it survives every hop projection); the
    // PATH array still rides so path-dependent sub-steps
    // (simplePath/cyclicPath INSIDE the filter) keep working
    val origin = copy(df = df
      .withColumn(PATH, array(col("id")))
      .withColumn(SFO, col("id")))
    val reached = sub(origin).df
      .select(col(SFO).as("__origin"))
      .distinct()
    val joined = df.join(reached, col("id") === col("__origin"),
      if (anti) "left_anti" else "left_semi")
    copy(df = joined)
  }

  /** Gremlin withSack(init): attach a per-traverser numeric
    * accumulator. The sack rides the frontier as ONE double column
    * (TAG-namespaced, so every hop projection carries it — the same
    * mechanism as as() tags), giving each traverser its own private
    * copy through bag-semantics fan-out, exactly TinkerPop's sack
    * contract, with zero joins. Whole-frontier barriers (fold,
    * repeat().until()) and branch steps that rebuild rows
    * (coalesce/optional) consume it — sack steps after them refuse
    * with a clean error. dedup() on a sack-carrying frontier keeps an
    * arbitrary survivor's sack (TinkerPop's unordered contract);
    * deterministic pipelines should aggregate before deduping.
    */
  def withSackInit(init: Double): Traversal =
    copy(df = df.withColumn(SACK, lit(init)))

  /** Gremlin sack(op).by(key): fold the CURRENT element's `key`
    * property into each traverser's sack — op ∈ sum/mult/min/max.
    * Works on vertex AND edge frontiers (edge-weight accumulation,
    * e.g. sack(sum).by('quantity'), is the classic use). One codegen'd
    * column expression, no shuffle.
    */
  def sackOp(op: String, key: String): Traversal = {
    require(df.columns.contains(SACK),
      s"sack($op) has no sack: start the traversal with withSack(init) " +
        "(a barrier or branch step may also have consumed it)")
    val k = col(key).cast("double")
    val next = op match {
      case "sum" => col(SACK) + k
      case "mult" => col(SACK) * k
      case "min" => least(col(SACK), k)
      case "max" => greatest(col(SACK), k)
      case other =>
        throw new IllegalArgumentException(s"unsupported sack operator $other")
    }
    copy(df = df.withColumn(SACK, next))
  }

  /** terminal: Gremlin sack() — each traverser's sack value (bag). */
  def sackValues(): DataFrame = {
    require(df.columns.contains(SACK),
      "sack() has no sack: start the traversal with withSack(init) " +
        "(a barrier or branch step may also have consumed it)")
    df.select(col(SACK).as("sack"))
  }

  /** Gremlin `as(label)`: tag the CURRENT vertex so a later
    * [[selectStep]]/[[select]] can refer back to it. The tag is one
    * extra id column riding the frontier — carried through every hop
    * by the frontier projection, costing one 8-byte column, never a
    * join. Re-tagging a used label overwrites it (Gremlin keeps a
    * list; the LAST element is what single-label select sees, which is
    * the overwrite semantic).
    */
  def as(label: String): Traversal = {
    requireV()
    copy(df = df.withColumn(TAG + label, col("id")))
  }

  /** Gremlin one-label `select('a')` MID-TRAVERSAL: jump the frontier
    * back to the vertex tagged 'a' (other tags and path survive). One
    * join against the vertices table re-hydrates the full row —
    * the same shape as a hop, so Catalyst/AQE treat it identically.
    */
  def selectStep(label: String): Traversal = {
    requireV()
    require(df.columns.contains(TAG + label), s"select: no as('$label') tag")
    val keep = Seq(col(TAG + label).as(HOP)) ++
      (if (hasPath) Seq(col(PATH)) else Nil) ++ tagCols
    val joined = df.select(keep: _*)
      .join(g.vertices, col(HOP) === col("id")).drop(HOP)
    copy(df = joined)
  }

  /** Gremlin multi-label `select('a','b',…)` terminal: one row per
    * traverser, one column per tag (the tagged vertex ids), column
    * names = the labels.
    */
  def select(labels: String*): DataFrame = {
    require(labels.nonEmpty, "select needs at least one label")
    labels.foreach(l => require(df.columns.contains(TAG + l),
      s"select: no as('$l') tag"))
    df.select(labels.map(l => col(TAG + l).as(l)): _*)
  }

  /** `select('a','b',…).by(k…)` — the by-modulated readout: each
    * column is the tagged vertex's PROPERTY value instead of its id.
    * One by-key applies to every label; N keys apply positionally
    * (TinkerPop's round-robin restricted to its two unambiguous
    * arities). Plan: one narrow hash join per label against the
    * column-pruned (id, k) vertex projection — the standard star
    * readout; nothing per-traverser, scans stay pruned to two columns.
    */
  def selectBy(labels: Seq[String], keys: Seq[String]): DataFrame =
    selectByClauses(labels, keys.map(Traversal.ByKey(_)))

  /** select(ls).by(…)… with the general by-clause forms project()
    * supports (VERDICT r14 task 3 — the asymmetry closed): a property
    * key (one narrow (id, k) hash join per label against the
    * column-pruned vertex projection) or a per-tagged-vertex
    * sub-traversal COUNT (`__.out(…).count()` — one origin-grouped
    * aggregate over the sub's DISTINCT-origin distributed run,
    * left-joined back on the tagged id, 0 where the sub reaches
    * nothing). One .by applies to every label; N bys apply
    * positionally (the same two TinkerPop arities as the key form).
    */
  def selectByClauses(labels: Seq[String],
                      bys: Seq[Traversal.ProjectBy]): DataFrame = {
    require(labels.nonEmpty, "select needs at least one label")
    require(bys.length == 1 || bys.length == labels.length,
      s"select(${labels.mkString(",")}) takes ONE .by (applies to all) " +
        s"or one per label — got ${bys.length} of ${labels.length}")
    labels.foreach(l => require(df.columns.contains(TAG + l),
      s"select: no as('$l') tag"))
    var cur = df.select(labels.map(l => col(TAG + l).as(s"__sel_$l")): _*)
    labels.zipWithIndex.foreach { case (l, i) =>
      val by = if (bys.length == 1) bys.head else bys(i)
      by match {
        case Traversal.ByKey(k) =>
          require(g.vertices.columns.contains(k),
            s"select().by('$k'): no such vertex property")
          val vk = g.vertices.select(col("id").as(s"__vid_$l"),
            col(k).as(s"__val_$l"))
          cur = cur.join(vk, col(s"__sel_$l") === col(s"__vid_$l"))
        case Traversal.BySubCount(sub) =>
          // origins = the DISTINCT tagged vertices (per-origin
          // semantics without per-row execution, same discipline as
          // project()'s count clauses)
          val origin = copy(isEdge = false, df = g.vertices
            .join(df.select(col(TAG + l).as("id")).distinct(), "id")
            .withColumn(PATH, array(col("id")))
            .withColumn(FCTX, lit(true)))
          val pid = s"__pid_$l"
          val cnt = sub(origin).df
            .groupBy(element_at(col(PATH), 1).as(pid))
            .agg(org.apache.spark.sql.functions.count(lit(1))
              .as(s"__val_$l"))
          cur = cur.join(cnt, col(s"__sel_$l") === col(pid), "left")
            .drop(pid)
            .withColumn(s"__val_$l", org.apache.spark.sql.functions
              .coalesce(col(s"__val_$l"), lit(0L)))
      }
    }
    cur.select(labels.map(l => col(s"__val_$l").as(l)): _*)
  }

  def dedup(): Traversal =
    if (isEdge) copy(df = df.dropDuplicates("src", "dst", "label", "sort_key"))
    else copy(df = df.dropDuplicates("id"))

  def limit(n: Int): Traversal = copy(df = df.limit(n))

  /** Gremlin range(lo, hi): skip the first `lo` travellers, keep the
    * next `hi − lo`. Deterministic after an order() step (Offset +
    * GlobalLimit compose on the sorted plan); without one the
    * selection is arbitrary, same as Gremlin's unordered contract.
    */
  def range(lo: Int, hi: Int): Traversal = {
    require(0 <= lo && lo <= hi, s"range bounds must satisfy 0 <= lo <= hi")
    copy(df = df.offset(lo).limit(hi - lo))
  }

  /** Gremlin skip(n): drop the first n travellers. */
  def skip(n: Int): Traversal = copy(df = df.offset(n))

  def order(key: String, asc: Boolean = true): Traversal =
    copy(df = df.orderBy(if (asc) col(key).asc else col(key).desc))

  /** terminal: bag of property values. */
  def values(key: String): DataFrame = df.select(col(key))

  /** Gremlin values(k).sum()/mean()/min()/max() terminals — one
    * map-side-combined aggregate over the frontier's property bag.
    */
  def sumOf(key: String): DataFrame =
    df.agg(sum(col(key)).as(s"sum_$key"))
  def meanOf(key: String): DataFrame =
    df.agg(avg(col(key)).as(s"mean_$key"))
  def minOf(key: String): DataFrame =
    df.agg(min(col(key)).as(s"min_$key"))
  def maxOf(key: String): DataFrame =
    df.agg(max(col(key)).as(s"max_$key"))

  /** Gremlin group().by(key).by(values(valKey).op()) — grouped
    * aggregate terminal (one partial+final hash-agg shuffle). `op` ∈
    * sum/mean/min/max; output columns (key, op_valKey).
    */
  def group(key: String, valKey: String, op: String): DataFrame = {
    val a = op match {
      case "sum" => sum(col(valKey))
      case "mean" => avg(col(valKey))
      case "min" => min(col(valKey))
      case "max" => max(col(valKey))
      case other =>
        throw new IllegalArgumentException(s"unsupported group aggregate $other")
    }
    df.groupBy(col(key)).agg(a.as(s"${op}_$valKey"))
  }

  /** Gremlin has(key) / hasNot(key): property EXISTENCE — in the
    * union-schema vertex frame a label that lacks the property carries
    * a typed NULL, so existence is a null test (the same semantic the
    * reference gets from key presence in the serialized row).
    */
  def hasKey(key: String): Traversal =
    copy(df = df.filter(col(key).isNotNull))
  def hasNot(key: String): Traversal =
    copy(df = df.filter(col(key).isNull))

  /** terminal: COUNT — the one aggregate the reference pushes down
    * (R10, TikvTable.java:135-148).
    */
  def count(): DataFrame = df.agg(count_lit_one.as("cnt"))

  /** terminal: the raw frontier. */
  def toDF: DataFrame = df
}

object Traversal {
  /** a project() by-clause: a property key, or a per-traverser
    * sub-traversal count (`__....count()`).
    */
  sealed trait ProjectBy
  final case class ByKey(k: String) extends ProjectBy
  final case class BySubCount(sub: Traversal => Traversal) extends ProjectBy

  private[graph] val FRONT = "__frontier_id"
  private[graph] val TAG = "__as_"

  /** internal origin rider for filter contexts (where/not/choose):
    * a TAG-namespaced column so it survives every hop projection; its
    * PRESENCE is how a whole-frontier barrier (repeatUntil) knows it
    * is running inside a per-origin filter and must refuse — user
    * path()/as() riders, by contrast, are silently consumed by
    * barriers (the parser gives clean positional errors when a later
    * step would have needed them)
    */
  private[graph] val SFO = TAG + "__origin__"

  /** filter-context marker for the origin-tracked contexts that do NOT
    * use SFO (coalesce/optional via PATH element_at, localLimit via its
    * TAG window, project BySubCount via PATH): TAG-namespaced so it
    * rides every hop projection; whole-frontier barriers check its
    * presence and refuse cleanly instead of dying downstream with an
    * unresolved-column error when the barrier consumes the origin
    * column (ADVICE r12). Dropped before each context's result leaves.
    */
  private[graph] val FCTX = TAG + "__filter_ctx__"

  /** per-traverser sack accumulator rider (TAG-namespaced so hop
    * projections carry it; see Traversal.withSackInit)
    */
  private[graph] val SACK = TAG + "__sack__"
  private[graph] val OTHER = "__other"
  private[graph] val HOP = "__hop_id"
  private[graph] val PATH = "__path"
  private[graph] val ORIGIN = "__origin"
  private[graph] val BRANCH = "__branch"
  private def count_lit_one = count(lit(1))

  private def filterEdges(e: DataFrame, ls: Seq[String]): DataFrame =
    if (ls.isEmpty) e else e.filter(col("label").isin(ls: _*))

  def vertices(g: PropertyGraph): Traversal = Traversal(g, g.vertices, isEdge = false)

  def vertexIds(g: PropertyGraph, ids: Seq[Long]): Traversal =
    Traversal(g, g.vertices.filter(col("id").isin(ids: _*)), isEdge = false)

  def edges(g: PropertyGraph): Traversal = Traversal(g, g.edges, isEdge = true)

  /** Gremlin unfold() over a [[Traversal.foldIds]] list: explode the id
    * bag back to one traverser per element and re-hydrate full vertex
    * rows with one join (bag multiplicity preserved — each id row
    * matches exactly its vertex).
    */
  def unfoldIds(g: PropertyGraph, folded: DataFrame): Traversal =
    Traversal(g,
      folded.select(explode(col("ids")).as("id")).join(g.vertices, Seq("id")),
      isEdge = false)
}
