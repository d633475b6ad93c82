package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Resumable paging — the reference's `supportsQueryByPage` surface
  * (TikvFeatures.java:81-84): a scan that returns `n` rows plus an
  * opaque token from which the next call resumes (page-position scan,
  * TikvTable.java:191-198, where the token is the raw key byte
  * position).
  *
  * Spark-first shape: KEYSET pagination, not OFFSET. The token is the
  * last sort-key value of the page; resuming filters `key > token`,
  * which pushes into the Parquet scan (min/max pruning skips whole
  * row groups below the token), and `orderBy(key).limit(n)` plans as
  * TakeOrderedAndProject — per-partition top-n, no global sort. Both
  * properties hold at any scale; an OFFSET page would re-read and
  * discard `offset` rows per call.
  *
  * The sort key must be unique (the reference pages on raw KV keys,
  * which are unique by construction); with duplicates a page boundary
  * could split a run of equal keys and the resume would skip rows.
  */
object Paging {

  /** One page of `n` rows ordered by `sortKey`, resuming strictly
    * after `token` (None = first page).
    */
  def page(df: DataFrame, sortKey: String, token: Option[Any], n: Int): DataFrame = {
    val resumed = token.fold(df)(t => df.filter(col(sortKey) > lit(t)))
    resumed.orderBy(col(sortKey)).limit(n)
  }

  /** The resume token for the page: its max sort-key value. One
    * driver-side scalar — this IS the value handed back to the caller,
    * exactly as the reference returns the page position to the client.
    * None when the page is empty (iteration is complete).
    *
    * NOTE: calling this on a lazy `page(...)` re-executes the page
    * query; callers iterating many pages should use [[pageAndToken]],
    * which materializes the page once and reads the token from the
    * materialized rows.
    */
  def nextToken(pageDf: DataFrame, sortKey: String): Option[Any] = {
    val r = pageDf.agg(max(col(sortKey))).collect()(0)
    if (r.isNullAt(0)) None else Some(r.get(0))
  }

  /** One page plus its resume token with the page computed exactly
    * once: the page is materialized (localCheckpoint — n rows, the
    * page size the caller chose) and the token read from the
    * materialized result, so neither the token nor the caller's
    * consumption of the page re-runs the sorted scan.
    */
  def pageAndToken(df: DataFrame, sortKey: String, token: Option[Any],
                   n: Int): (DataFrame, Option[Any]) = {
    val p = page(df, sortKey, token, n).localCheckpoint()
    (p, nextToken(p, sortKey))
  }

  /** R8 combined shard + page semantics (TikvTable.java:250-269): a
    * page token may advance the start position WITHIN a shard slice
    * [lo, hi), and a token below the shard's lower bound is rejected
    * up front — the reference validates the resumed key position
    * against the slice's start before scanning; a silent clamp would
    * re-serve rows from before the shard and break the disjointness
    * contract between shards.
    *
    * Plan shape: the shard bounds AND the resume predicate all push
    * into the Parquet scan (conjunctive range on the sort key), then
    * TakeOrderedAndProject — identical scale behavior to [[page]].
    */
  def shardPage[T](df: DataFrame, sortKey: String, lo: T, hi: T,
                   token: Option[T], n: Int)
                  (implicit ord: Ordering[T]): DataFrame = {
    token.foreach { t =>
      require(ord.gteq(t, lo),
        s"page token $t is below the shard lower bound $lo")
      require(ord.lt(t, hi),
        s"page token $t is at/after the shard upper bound $hi — " +
          "this shard's iteration is complete")
    }
    val shard = df.filter(col(sortKey) >= lit(lo) && col(sortKey) < lit(hi))
    page(shard, sortKey, token.map(t => t: Any), n)
  }

  /** Convenience: stitch the first `pages` pages of size `n` — used by
    * the gate query to prove two resumed pages equal one sorted
    * prefix. Real callers loop `pageAndToken` themselves.
    */
  def stitch(df: DataFrame, sortKey: String, n: Int, pages: Int): DataFrame = {
    var token: Option[Any] = None
    var out: Option[DataFrame] = None
    var i = 0
    var done = false
    while (i < pages && !done) {
      val (p, t) = pageAndToken(df, sortKey, token, n)
      token = t
      if (token.isEmpty) done = true
      else out = Some(out.map(_.unionByName(p)).getOrElse(p))
      i += 1
    }
    out.getOrElse(df.limit(0))
  }
}
