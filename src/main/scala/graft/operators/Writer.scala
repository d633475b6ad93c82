package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Write-path operators (SURVEY §2.2, W1–W12), re-expressed as pure
  * DataFrame→DataFrame transforms.
  *
  * The reference's write path is a buffered KV mutation batch
  * (TikvStdSessions.java:239-291) with no cross-key transaction
  * (supportsTransaction=false, TikvFeatures.java:109-111). In Spark the
  * batch IS the write job; these transforms define the merge semantics,
  * and a table format (Delta/Iceberg) supplies the atomicity the
  * reference lacks. Everything here is also the oracle-checkable core
  * of a MERGE INTO: the same anti-join + union shape a Delta merge
  * compiles to.
  */
object Writer {

  /** W1 insert: append rows (schema-aligned by name). */
  def insert(base: DataFrame, rows: DataFrame): DataFrame =
    base.unionByName(rows)

  /** W3/W10 upsert (MERGE): new rows win over base rows with the same
    * key. One shuffle on the key (the anti-join); at scale this is the
    * standard copy-on-write merge.
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    base.join(updates.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(updates)

  /** CDC apply: collapse an ordered change log (op ∈ I/U/D, one row
    * per change, `ord` breaks same-key ties — commit sequence or
    * (ts, lsn)) onto a base table. Per key, only the LATEST change
    * matters: row_number over (key DESC-by-ord) picks it, a D drops
    * the key, an I/U replaces it — the Debezium-style snapshot
    * semantics a streaming foreachBatch applies per micro-batch.
    *
    * Scale: ONE window shuffle over the (narrow) change log keyed by
    * `keys` + the upsert/delete anti-joins against base. The log is
    * never collected, and base is touched only by key joins.
    */
  def applyCdc(base: DataFrame, changes: DataFrame, keys: Seq[String],
      ordCol: String, opCol: String = "op"): DataFrame = {
    // deterministic by construction: ties on ordCol (two changes for
    // one key sharing a sequence number) fall through to a total
    // descending order over every remaining change column, so the
    // winner is a pure function of the data — never of partition
    // evaluation order across runs. Unorderable column types (maps,
    // exotic UDTs) cannot join a SortOrder — those tie-break on a
    // hash of the value instead, keeping schemas that carry them
    // plannable (hash ties then fall to the orderable columns' order,
    // and a full-row hash collision on same-ord changes is the only
    // residual nondeterminism — vanishingly rarer than the arrival
    // order this replaces).
    val tiebreak = changes.schema.fields
      .filterNot(f => keys.contains(f.name) || f.name == ordCol)
      .map { f =>
        if (org.apache.spark.sql.catalyst.expressions.RowOrdering
            .isOrderable(f.dataType)) col(f.name).desc
        // hash expressions reject maps too (SPARK-27619) — hash the
        // JSON rendering, which is total over nested SQL types
        else xxhash64(to_json(struct(col(f.name)))).desc
      }
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ordCol).desc +: tiebreak.toSeq: _*)
    val latest = changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val dels = latest.filter(col(opCol) === "D").select(keys.map(col): _*)
    // after stripping op/ord the payload must align with base's schema
    val ups = latest.filter(col(opCol) =!= "D").drop(opCol, ordCol)
    delete(upsert(base, ups, keys), dels, keys)
  }

  /** W2 delete by key set. */
  def delete(base: DataFrame, deleteKeys: DataFrame, keys: Seq[String]): DataFrame =
    base.join(deleteKeys.select(keys.map(col): _*), keys, "left_anti")

  /** W7 delete-range on an ordered key. */
  def deleteRange(base: DataFrame, key: String, from: Any, until: Any): DataFrame =
    base.filter(!(col(key) >= from && col(key) < until))

  /** W4 eliminate: null a property out (the reference deletes the cell,
    * TikvTable.java:129-132).
    */
  def eliminate(base: DataFrame, prop: String, where: Column): DataFrame =
    base.withColumn(prop, when(where, lit(null)).otherwise(col(prop)))

  /** W6/W11 truncate. */
  def truncate(base: DataFrame): DataFrame = base.limit(0)

  /** W1 TTL: attach an expiry timestamp column. The reference converts
    * ms→s and lets TiKV expire entries (TikvTable.java:95-101); here
    * expiry is a filter-on-read view over `expire_at`.
    */
  def withTtl(base: DataFrame, tsCol: String, ttl: Column): DataFrame =
    base.withColumn("expire_at", col(tsCol) + ttl)

  /** TTL filter-on-read (the read-side half of W1). */
  def liveAsOf(base: DataFrame, asOf: Column): DataFrame =
    base.filter(col("expire_at") > asOf)

  /** UNIQUE_INDEX constraint (TikvTables.java:212-219): key groups with
    * more than one row. Empty result ⇒ constraint holds; callers reject
    * the batch otherwise (ingest-time check, SURVEY §7.3).
    */
  def uniqueViolations(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** UNIQUE-enforcing insert — the ingest-time half of the constraint
    * (TikvTables.java:212-219 semantics): the whole batch is REFUSED
    * (loud IllegalStateException, base untouched) if the merged table
    * would violate the unique key, whether the collision is
    * batch-vs-base or inside the batch itself. The check is one
    * hash-aggregate job over the merged keys (map-side partial
    * counts — the same shuffle class as the insert it guards); the
    * violation count in the error message costs nothing extra.
    */
  def insertUnique(base: DataFrame, rows: DataFrame, keys: Seq[String]): DataFrame = {
    val merged = insert(base, rows)
    val nBad = uniqueViolations(merged.select(keys.map(col): _*), keys).count()
    if (nBad > 0) throw new IllegalStateException(
      s"unique constraint (${keys.mkString(", ")}) violated by $nBad key " +
        "group(s) — batch refused")
    merged
  }

  /** Compare-and-swap batch: each update row carries the value it
    * EXPECTS the base row to currently hold; the swap applies only
    * where that expectation matches — the optimistic-concurrency
    * refusal semantic behind the reference's atomic KV batches
    * (TikvStdSessions.java:245-261 batchPutAtomic — all-or-nothing
    * against concurrent writers; here each row's conflict surfaces
    * individually instead of aborting the batch). One key-equi join
    * against base; conflicts, absent keys and NULL expectations are
    * NO-OPS here — pair with [[casRejects]] to audit them, nothing is
    * silently dropped end-to-end (a NULL `expectedCol` surfaces as a
    * reject there: an update that never states its expectation can
    * never win the swap).
    *
    * PRECONDITION: `updates` must carry at most one row per key —
    * the left join would otherwise fan base rows out (one output row
    * per matching update), silently multiplying base cardinality.
    * Callers with ambiguous batches must resolve them first (e.g.
    * keep the latest per key); this operator will not pick a winner
    * silently.
    */
  def casUpdate(base: DataFrame, updates: DataFrame, keys: Seq[String],
                valueCol: String, expectedCol: String,
                newCol: String): DataFrame = {
    val u = updates.select((keys.map(col) :+ col(expectedCol) :+ col(newCol)): _*)
    base.join(u, keys, "left")
      .withColumn(valueCol,
        when(col(expectedCol).isNotNull && col(expectedCol) === col(valueCol),
          col(newCol)).otherwise(col(valueCol)))
      .drop(expectedCol, newCol)
  }

  /** The update rows [[casUpdate]] refused: expectation stale (current
    * value moved), key absent from base, or a NULL expectation (which
    * [[casUpdate]]'s isNotNull guard makes a no-op — without the
    * explicit isNull arm here the three-valued `=!=` would evaluate to
    * NULL and the row would vanish from BOTH outputs, breaking the
    * nothing-silently-dropped contract). All are conflicts a caller
    * must see to retry/abort, exactly what the reference's atomic
    * batch signals by failing.
    */
  def casRejects(base: DataFrame, updates: DataFrame, keys: Seq[String],
                 valueCol: String, expectedCol: String): DataFrame =
    updates.join(
        base.select((keys.map(col) :+ col(valueCol).as("cas_current")): _*),
        keys, "left")
      .filter(col(expectedCol).isNull || col("cas_current").isNull ||
        col(expectedCol) =!= col("cas_current"))

  /** W8 counter / id allocation, tiny-dimension path. The reference's
    * counter is a racy read-add-put (TikvStdSessions.java:396-405);
    * deterministic dense ids from a total order replace it (SURVEY
    * §7.4: do not replicate the race). A global row_number is a
    * single-partition sort — acceptable only for small dims; use
    * [[allocateIdsPartitioned]] for anything large.
    */
  def allocateIds(df: DataFrame, orderBy: Seq[String], start: Long = 1L,
                  idCol: String = "alloc_id"): DataFrame =
    df.withColumn(idCol,
      (row_number().over(Window.orderBy(orderBy.map(col): _*)) + (start - 1))
        .cast("long"))

  /** W8 at scale: the same deterministic dense ids with NO
    * single-partition sort. Range-partition on the order keys (so
    * partition i holds a contiguous, ordered key range), sort within
    * partitions — a fully parallel sort — then assign
    * `start + globalIndex` via zipWithIndex, whose only extra cost is
    * one lightweight count job to compute per-partition offsets.
    * Output ids are identical to [[allocateIds]] when `orderBy` is a
    * total order (the determinism contract both paths share); rows
    * with equal keys get arbitrary but stable-within-run relative ids.
    */
  def allocateIdsPartitioned(df: DataFrame, orderBy: Seq[String], start: Long = 1L,
                             idCol: String = "alloc_id",
                             numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val cols = orderBy.map(col)
    val sorted = df.repartitionByRange(n, cols: _*).sortWithinPartitions(cols: _*)
    val schema = sorted.schema.add(idCol, org.apache.spark.sql.types.LongType,
      nullable = false)
    val rows = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (start + i))
    }
    spark.createDataFrame(rows, schema)
  }
}
