package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{CurrentTimestamp, GreaterThan}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** TTL filter-on-read as a Catalyst optimizer rule.
  *
  * The reference's TTL is enforced BY THE STORE: TiKV expires entries
  * transparently, so no query author ever writes the expiry predicate
  * (TikvTable.java:95-101, supportsTtl TikvFeatures.java:124-126). The
  * faithful Spark analog is therefore a plan rewrite, not a
  * convention: any scanned relation carrying the `expire_at` column
  * gets `expire_at > current_timestamp()` injected above it, unless
  * disabled via `spark.graft.ttl.enabled=false`.
  *
  * Scale note: the injected predicate is an ordinary pushable filter,
  * so Parquet row-group stats prune fully-expired files — the same
  * effect as TiKV's physical expiry, lazily.
  */
object TtlFilterRule extends Rule[LogicalPlan] {
  val TtlColumn = "expire_at"
  private val applied = TreeNodeTag[Boolean]("graft.ttl.applied")

  private def enabled: Boolean =
    conf.getConfString("spark.graft.ttl.enabled", "true") == "true"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      // V1 file relations and DSv2 relations both match: the reader
      // config (spark.sql.sources.useV1SourceList) decides which node
      // a parquet scan plans to, and TTL must hold under either.
      case r: LogicalRelation
          if r.getTagValue(applied).isEmpty &&
            r.output.exists(_.name == TtlColumn) =>
        r.setTagValue(applied, true)
        val attr = r.output.find(_.name == TtlColumn).get
        Filter(GreaterThan(attr, CurrentTimestamp()), r)
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
          if r.getTagValue(applied).isEmpty &&
            r.output.exists(_.name == TtlColumn) =>
        r.setTagValue(applied, true)
        val attr = r.output.find(_.name == TtlColumn).get
        Filter(GreaterThan(attr, CurrentTimestamp()), r)
      // After V2ScanRelationPushDown the V2 read is a scan relation.
      // NOTE: that rule also prunes columns, so a query that never
      // references expire_at (e.g. a bare count) has no attribute left
      // to filter on by post-hoc time — installing via GraftExtensions
      // (injectOptimizerRule → operator-optimization batch, BEFORE
      // pushdown) closes that window; this arm covers post-hoc
      // installs for reads that keep the column.
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
          if r.getTagValue(applied).isEmpty &&
            r.output.exists(_.name == TtlColumn) =>
        r.setTagValue(applied, true)
        val attr = r.output.find(_.name == TtlColumn).get
        Filter(GreaterThan(attr, CurrentTimestamp()), r)
    }
}

/** Session extension entry point:
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`, or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => TtlFilterRule)
}
