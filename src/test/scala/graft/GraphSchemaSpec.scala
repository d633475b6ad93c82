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
    assert(GraphSchema.tpch.validateEdges(g.edges).isEmpty)
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
