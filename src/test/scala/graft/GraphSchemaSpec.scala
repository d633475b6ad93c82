package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.PropertyGraph
import graft.schema.{GraphSchema, IndexKind, IndexLabelDef}

class GraphSchemaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tpch graph passes its declared schema") {
    val g = PropertyGraph.fromTpch(spark, TestSpark.sfDir)
    assert(GraphSchema.tpch.validateVertices(g.vertices).isEmpty)
    assert(GraphSchema.tpch.validateEdges(g.edges, Some(g.vertices)).isEmpty)
  }

  test("edge with undeclared endpoint pair is rejected") {
    import org.apache.spark.sql.functions._
    val g = PropertyGraph.fromTpch(spark, TestSpark.sfDir)
    // redirect one placed edge to point part→order instead of
    // customer→order: label exists, endpoint pair does not
    val bad = g.edges.limit(0).unionByName(
      g.edges.filter($"label" === "placed").limit(1)
        .withColumn("src", lit(PropertyGraph.encodeId("part", 1L))))
    val errs = GraphSchema.tpch.validateEdges(bad, Some(g.vertices))
    assert(errs.exists(_.contains("undeclared endpoint pair (part -> order)")))
  }

  test("edge endpoint missing from vertices is rejected") {
    import org.apache.spark.sql.functions._
    val g = PropertyGraph.fromTpch(spark, TestSpark.sfDir)
    val dangling = g.edges.filter($"label" === "placed").limit(1)
      .withColumn("src", lit(Long.MaxValue))
    val errs = GraphSchema.tpch.validateEdges(dangling, Some(g.vertices))
    assert(errs.exists(_.contains("endpoint vertex missing")))
  }

  test("undeclared label is rejected") {
    import org.apache.spark.sql.functions._
    val g = PropertyGraph.fromTpch(spark, TestSpark.sfDir)
    val bad = g.vertices.withColumn("label",
      when($"label" === "region", "alien").otherwise($"label"))
    val errs = GraphSchema.tpch.validateVertices(bad)
    assert(errs.exists(_.contains("undeclared vertex label in data: alien")))
  }

  test("wrong property type is rejected structurally") {
    val g = PropertyGraph.fromTpch(spark, TestSpark.sfDir)
    val bad = g.vertices.withColumn("acctbal",
      org.apache.spark.sql.functions.col("acctbal").cast("string"))
    val errs = GraphSchema.tpch.validateVertices(bad)
    assert(errs.exists(_.contains("property acctbal: expected double")))
  }

  test("unique index violation is reported") {
    val g = PropertyGraph.fromTpch(spark, TestSpark.sfDir)
    val dup = g.vertices.unionByName(
      g.vertices.filter($"label" === "customer").limit(1))
    val errs = GraphSchema.tpch.validateVertices(dup)
    assert(errs.exists(_.contains("unique index vertex_id_unique violated")))
  }
}
