package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Schema-full property graph as two columnar DataFrames.
  *
  * The reference stores a graph as 16 KV tables: VERTEX, EDGE_OUT +
  * EDGE_IN (every edge written twice, once per direction —
  * TikvTables.java:128-143), and ten index tables
  * (TikvStore.java:345-381). Here the same model is two Parquet-backed
  * DataFrames:
  *
  *  - `vertices(id, label, <union of per-label property columns>)`
  *  - `edges(src, dst, label, sort_key, <edge property columns>)`
  *
  * The out/in duplication disappears: Spark can shuffle/join on either
  * `src` or `dst`, and at 100 TB the optimization the dual tables buy
  * (locality per direction) is recovered by writing the edges table
  * twice bucketed — an optional materialization, not a semantic need.
  * The ten index tables are replaced by Parquet min/max stats +
  * predicate pushdown + label partition pruning (SURVEY §1.3).
  *
  * Vertex ids are label-namespaced: `(labelCode << 40) | naturalKey`,
  * mirroring the reference's label-prefixed binary ids (opaque sortable
  * byte arrays, TikvTable.java:113).
  */
final case class PropertyGraph(vertices: DataFrame, edges: DataFrame,
                               edgesByDst: Option[DataFrame] = None) {
  /** Entry to the traversal DSL (Gremlin `g.V()`). */
  def V: Traversal = Traversal.vertices(this)
  def V(ids: Long*): Traversal = Traversal.vertexIds(this, ids)
  /** Gremlin `g.E()`. */
  def E: Traversal = Traversal.edges(this)

  /** The edge frame clustered for dst-keyed joins — the EDGE_IN copy
    * when the graph is backed by dual bucketed storage
    * (GraphStorage.saveGraph); falls back to the single frame. in()
    * traversals join this copy so a bucketed layout serves BOTH
    * directions shuffle-free, exactly the locality the reference buys
    * by writing every edge twice (TikvTables.java:128-143).
    */
  def edgesForDst: DataFrame = edgesByDst.getOrElse(edges)
}

object PropertyGraph {
  // label codes for id namespacing (region of the long keyspace per label)
  val LabelCodes: Map[String, Long] = Map(
    "customer" -> 1L, "order" -> 2L, "part" -> 3L,
    "supplier" -> 4L, "nation" -> 5L, "region" -> 6L)
  val Shift = 40

  def encode(label: String, key: Column): Column =
    lit(LabelCodes(label) << Shift) + key.cast("long")

  def encodeId(label: String, key: Long): Long = (LabelCodes(label) << Shift) | key

  /** SQL fragment mirroring [[encode]] for DuckDB oracles. */
  def sqlEncode(label: String, keyExpr: String): String =
    s"(${LabelCodes(label) << Shift} + CAST($keyExpr AS BIGINT))"

  private val vertexProps = Seq(
    "name", "mktsegment", "acctbal", "totalprice", "orderdate", "priority",
    "status", "brand", "ptype", "size", "retailprice", "nationkey",
    "tags", "props")

  // collection-valued properties (LIST/SET cardinality + the dynamic
  // property bag of SURVEY §1.3) need typed nulls for the union
  private val typedNulls: Map[String, Column] = Map(
    "tags" -> lit(null).cast("array<string>"),
    "props" -> lit(null).cast("map<string,string>"))

  /** Align a per-label projection onto the union vertex schema.
    * At scale this wide-union stays cheap: Parquet is columnar, so
    * unused label columns are never read (column pruning), and a
    * label-partitioned layout prunes whole files on hasLabel.
    */
  private def align(df: DataFrame, have: Map[String, Column]): DataFrame = {
    val cols = col("id") +: col("label") +: vertexProps.map { p =>
      have.getOrElse(p, typedNulls.getOrElse(p, lit(null))).as(p)
    }
    df.select(cols: _*)
  }

  /** Build the property-graph view of the TPC-H star schema
    * (FIXTURES.md mapping).
    */
  def fromTpch(s: SparkSession, dir: String): PropertyGraph = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    val p = Tables.part(s, dir)
    val su = Tables.supplier(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    val li = Tables.lineitem(s, dir)

    val vertices =
      align(
        c.select(encode("customer", col("c_custkey")).as("id"),
          lit("customer").as("label"), col("c_name"), col("c_mktsegment"),
          col("c_acctbal"), col("c_nationkey")),
        Map("name" -> col("c_name"), "mktsegment" -> col("c_mktsegment"),
          "acctbal" -> col("c_acctbal"), "nationkey" -> col("c_nationkey"),
          // SET-cardinality property (deterministic from scalar props)
          // + dynamic bag — the reference serializer's list/set
          // cardinality and ContainsKey surface (TikvFeatures.java:71-79)
          "tags" -> array(
            concat(lit("seg_"), lower(col("c_mktsegment"))),
            concat(lit("nat_"), col("c_nationkey").cast("string"))),
          "props" -> map(
            lit("segment"), col("c_mktsegment"),
            lit("nation"), col("c_nationkey").cast("string")))) union
      align(
        o.select(encode("order", col("o_orderkey")).as("id"),
          lit("order").as("label"), col("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority")),
        Map("status" -> col("o_orderstatus"), "totalprice" -> col("o_totalprice"),
          "orderdate" -> col("o_orderdate"), "priority" -> col("o_orderpriority"),
          "tags" -> array(concat(lit("status_"), col("o_orderstatus"))),
          "props" -> map(
            lit("status"), col("o_orderstatus"),
            lit("priority"), col("o_orderpriority")))) union
      align(
        p.select(encode("part", col("p_partkey")).as("id"),
          lit("part").as("label"), col("p_name"), col("p_brand"),
          col("p_type"), col("p_size"), col("p_retailprice")),
        Map("name" -> col("p_name"), "brand" -> col("p_brand"),
          "ptype" -> col("p_type"), "size" -> col("p_size"),
          "retailprice" -> col("p_retailprice"))) union
      align(
        su.select(encode("supplier", col("s_suppkey")).as("id"),
          lit("supplier").as("label"), col("s_name"), col("s_acctbal"),
          col("s_nationkey")),
        Map("name" -> col("s_name"), "acctbal" -> col("s_acctbal"),
          "nationkey" -> col("s_nationkey"))) union
      align(
        n.select(encode("nation", col("n_nationkey")).as("id"),
          lit("nation").as("label"), col("n_name")),
        Map("name" -> col("n_name"))) union
      align(
        r.select(encode("region", col("r_regionkey")).as("id"),
          lit("region").as("label"), col("r_name")),
        Map("name" -> col("r_name")))

    def edge(src: Column, dst: Column, label: String,
             sortKey: Column = lit(null).cast("long"),
             quantity: Column = lit(null).cast("double"),
             extendedprice: Column = lit(null).cast("double"),
             discount: Column = lit(null).cast("double"),
             orderdate: Column = lit(null).cast("timestamp")): Seq[Column] =
      Seq(src.as("src"), dst.as("dst"), lit(label).as("label"),
        sortKey.cast("long").as("sort_key"), quantity.as("quantity"),
        extendedprice.as("extendedprice"), discount.as("discount"),
        orderdate.as("orderdate"))

    val edges =
      o.select(edge(encode("customer", col("o_custkey")),
        encode("order", col("o_orderkey")), "placed",
        orderdate = col("o_orderdate")): _*) union
      li.select(edge(encode("order", col("l_orderkey")),
        encode("part", col("l_partkey")), "contains",
        sortKey = col("l_linenumber"), quantity = col("l_quantity"),
        extendedprice = col("l_extendedprice"), discount = col("l_discount")): _*) union
      li.select(col("l_partkey"), col("l_suppkey")).distinct()
        .select(edge(encode("part", col("l_partkey")),
          encode("supplier", col("l_suppkey")), "supplied_by"): _*) union
      c.select(edge(encode("customer", col("c_custkey")),
        encode("nation", col("c_nationkey")), "located_in"): _*) union
      su.select(edge(encode("supplier", col("s_suppkey")),
        encode("nation", col("s_nationkey")), "located_in"): _*) union
      n.select(edge(encode("nation", col("n_nationkey")),
        encode("region", col("n_regionkey")), "part_of"): _*)

    PropertyGraph(vertices, edges)
  }
}
