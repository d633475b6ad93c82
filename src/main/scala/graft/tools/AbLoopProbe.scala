package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM alternating A/B of the r15 loop restructures (old round
  * shape vs new), so the hypervisor-steal weather hits both sides of
  * the comparison equally: runs interleave A,B,A,B,... and the min of
  * each side is reported (contention only ever ADDS time). Old shapes
  * are copied verbatim from the r14 HEAD.
  */
object AbLoopProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val kryoConf = new org.apache.spark.SparkConf()
      .set("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
    org.apache.spark.graphx.GraphXUtils.registerKryoClasses(kryoConf)
    val spark = SparkSession.builder().config(kryoConf).master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val g = graft.graph.PropertyGraph.fromTpch(spark, dir)

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- LPA old shape (r14 HEAD) ----
    def lpaOld(): DataFrame = {
      val all = g.edges
      val und = all.select(
          least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
      val adj = und.select(explode(array(
          struct(col("a").as("v"), col("b").as("n")),
          struct(col("b").as("v"), col("a").as("n")))).as("e"))
        .select(col("e.v").as("v"), col("e.n").as("n"))
        .repartition(col("n")).persist(MEMORY_AND_DISK)
      val verts = g.vertices.select(col("id")).distinct()
        .persist(MEMORY_AND_DISK)
      try {
        val rc = new graft.util.Checkpoints.Rolling
        var lab = rc.roll(verts.select(col("id"), col("id").as("lbl")))
        for (_ <- 1 to 4) {
          val nb = adj.join(
            lab.select(col("id").as("n"), col("lbl")).hint("shuffle_hash"), "n")
          val pick = nb.groupBy(col("v"), col("lbl"))
            .agg(count(lit(1)).as("cnt"))
            .groupBy(col("v"))
            .agg(max(struct(col("cnt"), (-col("lbl")).as("nl"))).as("m"))
            .select(col("v").as("id"), (-col("m.nl")).as("new_lbl"))
          lab = rc.roll(lab.join(pick, Seq("id"), "left")
            .select(col("id"), coalesce(col("new_lbl"), col("lbl")).as("lbl")))
        }
        lab.groupBy(col("lbl")).agg(count(lit(1)).as("size"))
          .groupBy(col("size")).agg(count(lit(1)).as("n_communities"))
          .orderBy(col("size")).localCheckpoint(true)
      } finally {
        adj.unpersist(blocking = false); verts.unpersist(blocking = false)
      }
    }

    // ---- LPA two-level-agg variant (r16 open item): repartition(v)
    // once after the adjacency join, then BOTH aggs run exchange-free
    // (HashPartitioning(v) satisfies ClusteredDistribution(v,lbl)) —
    // trades the (v,lbl) partial-agg exchange + the (v) exchange for
    // ONE raw-row exchange on v ----
    def lpaTwoLevel(): DataFrame = {
      val all = g.edges
      val und = all.select(
          least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
      val adj = und.select(explode(array(
          struct(col("a").as("v"), col("b").as("n")),
          struct(col("b").as("v"), col("a").as("n")))).as("e"))
        .select(col("e.v").as("v"), col("e.n").as("n"))
        .repartition(col("n")).persist(MEMORY_AND_DISK)
      val verts = g.vertices.select(col("id")).distinct()
        .persist(MEMORY_AND_DISK)
      try {
        val rc = new graft.util.Checkpoints.Rolling
        var lab = rc.roll(verts.select(col("id"), col("id").as("lbl")))
        for (_ <- 1 to 4) {
          val nb = adj.join(
            lab.select(col("id").as("n"), col("lbl")).hint("shuffle_hash"), "n")
          val pick = nb.select(col("v"), col("lbl"))
            .repartition(col("v"))
            .groupBy(col("v"), col("lbl"))
            .agg(count(lit(1)).as("cnt"))
            .groupBy(col("v"))
            .agg(max(struct(col("cnt"), (-col("lbl")).as("nl"))).as("m"))
            .select(col("v").as("id"), (-col("m.nl")).as("new_lbl"))
          lab = rc.roll(lab.join(pick, Seq("id"), "left")
            .select(col("id"), coalesce(col("new_lbl"), col("lbl")).as("lbl")))
        }
        lab.groupBy(col("lbl")).agg(count(lit(1)).as("size"))
          .groupBy(col("size")).agg(count(lit(1)).as("n_communities"))
          .orderBy(col("size")).localCheckpoint(true)
      } finally {
        adj.unpersist(blocking = false); verts.unpersist(blocking = false)
      }
    }

    def lpaNew(): DataFrame = {
      val out = graft.graph.Algorithms
        .labelPropagation(spark, g, iters = 4)
        .groupBy(col("lbl")).agg(count(lit(1)).as("size"))
        .groupBy(col("size")).agg(count(lit(1)).as("n_communities"))
        .orderBy(col("size")).localCheckpoint(true)
      out
    }

    // ---- pageRank old shape (r14 HEAD) ----
    def prOld(): DataFrame = {
      val edges = g.edges.select(col("src"), col("dst"))
      val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      val edgesDeg = edges.join(outdeg, "src")
        .select(col("src"), col("dst"), col("outdeg"))
        .persist(MEMORY_AND_DISK)
      val verts = edges.select(col("src").as("id"))
        .union(edges.select(col("dst").as("id"))).distinct()
        .persist(MEMORY_AND_DISK)
      try {
        val rc = new graft.util.Checkpoints.Rolling
        var pr = rc.roll(verts.select(col("id"), lit(1000000L).as("pr")))
        for (k <- 1 to 10) {
          val contrib = edgesDeg
            .join(pr.select(col("id").as("src"), col("pr")), "src")
            .select(col("dst").as("id"), expr("pr div outdeg").as("c"))
            .groupBy(col("id")).agg(sum(col("c")).as("m"))
          val next = verts.join(contrib, Seq("id"), "left")
            .select(col("id"),
              expr("150000L + (85L * coalesce(m, 0L)) div 100L").as("pr"))
          pr = if (k % 2 == 0 || k == 10) rc.roll(next) else next
        }
        pr
      } finally {
        edgesDeg.unpersist(blocking = false); verts.unpersist(blocking = false)
      }
    }

    def prNew(): DataFrame =
      graft.graph.Algorithms.pageRankExact(spark, g, Nil, 10)

    // ---- pageRank r15 shape (constant noIn union + cadence-2, but
    // UNpartitioned edge cache and no shuffle_hash hint) — the OLD
    // side of the r16 partition+hint A/B ----
    def prR15(): DataFrame = {
      val edges = g.edges.select(col("src"), col("dst"))
      val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      val edgesDeg = edges.join(outdeg, "src")
        .select(col("src"), col("dst"), col("outdeg"))
        .persist(MEMORY_AND_DISK)
      val verts = edges.select(col("src").as("id"))
        .union(edges.select(col("dst").as("id"))).distinct()
        .persist(MEMORY_AND_DISK)
      val noIn = verts
        .join(edgesDeg.select(col("dst").as("id")), Seq("id"), "left_anti")
        .select(col("id"), lit(150000L).as("pr"))
        .persist(MEMORY_AND_DISK)
      try {
        val rc = new graft.util.Checkpoints.Rolling
        var pr = rc.roll(verts.select(col("id"), lit(1000000L).as("pr")))
        for (k <- 1 to 10) {
          val contrib = edgesDeg
            .join(pr.select(col("id").as("src"), col("pr")), "src")
            .select(col("dst").as("id"), expr("pr div outdeg").as("c"))
            .groupBy(col("id")).agg(sum(col("c")).as("m"))
          val next = contrib
            .select(col("id"), expr("150000L + (85L * m) div 100L").as("pr"))
            .unionByName(noIn)
          pr = if (k % 2 == 0 || k == 10) rc.roll(next) else next
        }
        pr
      } finally {
        edgesDeg.unpersist(blocking = false)
        verts.unpersist(blocking = false)
        noIn.unpersist(blocking = false)
      }
    }

    // ---- r16 shape with PARAMETERIZED cache partition count:
    // session-default (32) vs size-derived (loopParts → 1 at sf0.1).
    // Isolates the per-round task-scheduling fan-out cost.
    def prParts(sized: Boolean): DataFrame = {
      val geoOnly = sys.env.get("SPARK_GRAFT_PRN_GEO").forall(_ == "1")
      val e00 = if (geoOnly)
        g.edges.filter(col("label").isin("located_in", "part_of"))
      else g.edges
      val edges = e00.select(col("src"), col("dst"))
      val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      val edgesDeg0 = edges.join(outdeg, "src")
        .select(col("src"), col("dst"), col("outdeg"))
      val edgesDeg = (if (sized) {
        val n = graft.util.Partitioning.loopParts(spark, edges.count(),
          sys.env.get("SPARK_GRAFT_PRN_RPP").map(_.toLong).getOrElse(2000000L))
        edgesDeg0.repartition(n, col("src"))
      } else edgesDeg0.repartition(col("src"))).persist(MEMORY_AND_DISK)
      val verts = edges.select(col("src").as("id"))
        .union(edges.select(col("dst").as("id"))).distinct()
        .persist(MEMORY_AND_DISK)
      val noIn = verts
        .join(edgesDeg.select(col("dst").as("id")), Seq("id"), "left_anti")
        .select(col("id"), lit(150000L).as("pr"))
        .persist(MEMORY_AND_DISK)
      try {
        val rc = new graft.util.Checkpoints.Rolling
        var pr = rc.roll(verts.select(col("id"), lit(1000000L).as("pr")))
        for (k <- 1 to 10) {
          val contrib = edgesDeg
            .join(pr.select(col("id").as("src"), col("pr"))
              .hint("shuffle_hash"), "src")
            .select(col("dst").as("id"), expr("pr div outdeg").as("c"))
            .groupBy(col("id")).agg(sum(col("c")).as("m"))
          val next = contrib
            .select(col("id"), expr("150000L + (85L * m) div 100L").as("pr"))
            .unionByName(noIn)
          pr = if (k % 5 == 0 || k == 10) rc.roll(next) else next
        }
        pr.orderBy(col("pr").desc, col("id")).limit(10).localCheckpoint(true)
      } finally {
        edgesDeg.unpersist(blocking = false)
        verts.unpersist(blocking = false)
        noIn.unpersist(blocking = false)
      }
    }

    // ---- Louvain old shape (r14 HEAD) ----
    def louvainOld(): DataFrame = {
      val all = g.edges.filter(col("label").isin("located_in", "part_of"))
      val und = all.select(
          least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .filter(col("a") =!= col("b")).distinct().persist(MEMORY_AND_DISK)
      val sym = und.select(explode(array(
          struct(col("a").as("v"), col("b").as("n")),
          struct(col("b").as("v"), col("a").as("n")))).as("e"))
        .select(col("e.v").as("v"), col("e.n").as("n"))
        .repartition(col("n")).persist(MEMORY_AND_DISK)
      val deg = und.select(col("a").as("v")).union(und.select(col("b")))
        .groupBy(col("v")).agg(count(lit(1)).as("d")).persist(MEMORY_AND_DISK)
      try {
        val m2 = 2L * und.count()
        val rc = new graft.util.Checkpoints.Rolling
        var asg = rc.roll(deg.select(col("v").as("id"), col("v").as("c")))
        for (r <- 1 to 6) {
          val tot = asg.join(deg.select(col("v").as("id"), col("d")), "id")
            .groupBy(col("c")).agg(sum(col("d")).as("tot"))
          val kin = sym
            .join(asg.select(col("id").as("n"), col("c").as("nc")), "n")
            .groupBy(col("v"), col("nc")).agg(count(lit(1)).as("kin"))
          val cand = kin
            .unionByName(asg.select(col("id").as("v"), col("c").as("nc"),
              lit(0L).as("kin")))
            .groupBy(col("v"), col("nc")).agg(sum(col("kin")).as("kin"))
          val scored = cand
            .join(deg, "v")
            .join(tot.select(col("c").as("nc"), col("tot")), "nc")
            .join(asg.select(col("id").as("v"), col("c").as("cur")), "v")
            .select(col("v"), col("nc"), col("cur"),
              (lit(m2) * col("kin") - col("d") *
                (col("tot") - when(col("nc") === col("cur"), col("d"))
                  .otherwise(lit(0L)))).as("score"))
          val best = scored.groupBy(col("v"))
            .agg(max(struct(col("score"), (-col("nc")).as("mn"))).as("b"),
              max(when(col("nc") === col("cur"), col("score"))).as("os"))
            .select(col("v").as("id"), col("b.score").as("bs"),
              (-col("b.mn")).as("bc"), col("os"))
          asg = rc.roll(asg.join(best, "id")
            .select(col("id"),
              when(col("id") % 2 === lit(r % 2) && col("bs") > col("os"),
                col("bc")).otherwise(col("c")).as("c")))
        }
        asg.localCheckpoint()
      } finally {
        und.unpersist(blocking = false); sym.unpersist(blocking = false)
        deg.unpersist(blocking = false)
      }
    }

    def louvainNew(): DataFrame =
      graft.graph.Algorithms.louvainLevel1(spark, g, rounds = 6,
        labels = Seq("located_in", "part_of"))

    // ---- triangle closure old shape (r14 HEAD, unpartitioned cache) ----
    def triFrom(repart: Boolean): DataFrame = {
      val e = g.edges.select(
          least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
        .persist(MEMORY_AND_DISK)
      try {
        val deg = e.select(col("a").as("v")).union(e.select(col("b")))
          .groupBy(col("v")).agg(count(lit(1)).as("d"))
        val withDeg = e
          .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
          .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
        val fwd = col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b"))
        val o0 = withDeg.select(
          when(fwd, col("a")).otherwise(col("b")).as("u"),
          when(fwd, col("b")).otherwise(col("a")).as("w"),
          when(fwd, col("db")).otherwise(col("da")).as("dw"))
        val o = (if (repart) o0.repartition(col("u")).sortWithinPartitions("u")
                 else o0).persist(MEMORY_AND_DISK)
        try {
          val wedges = o.select(col("u"), col("w").as("w1"), col("dw").as("d1"))
            .join(o.select(col("u"), col("w").as("w2"), col("dw").as("d2")), "u")
            .filter(col("d1") < col("d2") ||
              (col("d1") === col("d2") && col("w1") < col("w2")))
            .select(col("w1"), col("w2"))
          wedges.join(
              o.select(col("u").as("w1"), col("w").as("w2")),
              Seq("w1", "w2"), "left_semi")
            .agg(count(lit(1)).cast("long").as("total_triangles"))
            .localCheckpoint(eager = true)
        } finally o.unpersist(blocking = false)
      } finally e.unpersist(blocking = false)
    }

    // ---- g18 BFS old shape (r14 HEAD: wide in-loop vertices, full
    // edge cache, per-round semi-join against the parquet union) ----
    def g18Old(): DataFrame = {
      val level = MEMORY_AND_DISK
      import graft.graph.{PropertyGraph, Traversal}
      val gc = PropertyGraph(g.vertices, g.edges.persist(level), g.edgesByDst)
      try {
        var frontierIds = gc.vertices
          .filter(col("id") === PropertyGraph.encodeId("region", 0L))
          .select(col("id")).dropDuplicates("id").localCheckpoint()
        var visited = frontierIds
        var reached: Option[DataFrame] = None
        var depth = 0
        while (depth < 50 && !frontierIds.isEmpty) {
          val frontierV = gc.vertices.join(frontierIds, Seq("id"), "left_semi")
          val stepped = Traversal(gc, frontierV, isEdge = false).in()
          val nextIds = stepped.df.select(col("id")).dropDuplicates("id")
            .join(visited, Seq("id"), "left_anti")
            .localCheckpoint()
          reached = Some(reached.map(_.union(nextIds)).getOrElse(nextIds))
          visited = visited.union(nextIds)
          frontierIds = nextIds
          depth += 1
        }
        val ids = reached.get
        g.vertices.join(ids, Seq("id"), "left_semi")
          .groupBy(col("label")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("label")).localCheckpoint(true)
      } finally gc.edges.unpersist(blocking = true)
    }

    def g18New(): DataFrame = {
      val out = graft.SparkEntry.queries("g18_reach_until")(spark, dir)
      out.localCheckpoint(true)
    }

    // ---- g18 BFS r15 shape (narrow (id,label) loop cache + pruned
    // edge cache, but ID-ONLY state with a per-round rehydration
    // semi-join) — the OLD side of the r16 state-carry A/B ----
    def g18R15(): DataFrame = {
      val level = MEMORY_AND_DISK
      import graft.graph.{PropertyGraph, Traversal}
      val loopV = g.vertices.select(col("id"), col("label"))
        .repartition(col("id")).sortWithinPartitions("id").persist(level)
      val loopE = g.edges.select(col("src"), col("dst"), col("label"))
        .persist(level)
      val gc = PropertyGraph(loopV, loopE, g.edgesByDst)
      try {
        var frontierIds = g.vertices
          .filter(col("id") === PropertyGraph.encodeId("region", 0L))
          .select(col("id")).dropDuplicates("id").localCheckpoint()
        var visited = frontierIds
        var reached: Option[DataFrame] = None
        var depth = 0
        while (depth < 50 && !frontierIds.isEmpty) {
          val frontierV = gc.vertices.join(frontierIds, Seq("id"), "left_semi")
          val stepped = Traversal(gc, frontierV, isEdge = false).in()
          val nextIds = stepped.df.select(col("id")).dropDuplicates("id")
            .join(visited, Seq("id"), "left_anti")
            .localCheckpoint()
          reached = Some(reached.map(_.union(nextIds)).getOrElse(nextIds))
          visited = visited.union(nextIds)
          frontierIds = nextIds
          depth += 1
        }
        val ids = reached.get
        g.vertices.join(ids, Seq("id"), "left_semi")
          .groupBy(col("label")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("label")).localCheckpoint(true)
      } finally {
        loopE.unpersist(blocking = true)
        loopV.unpersist(blocking = true)
      }
    }

    // ---- g52 repeatUntilReached r15 shape (per-loop stop set, lazy
    // stop joins, ID-ONLY state + rehydration semi-join) ----
    def g52R15(): DataFrame = {
      val level = MEMORY_AND_DISK
      import graft.graph.{PropertyGraph, Traversal}
      val loopV = g.vertices.select(col("id"), col("label"))
        .repartition(col("id")).sortWithinPartitions("id").persist(level)
      val loopE = g.edges.select(col("src"), col("dst"), col("label"))
        .persist(level)
      val gc = PropertyGraph(loopV, loopE, g.edgesByDst)
      val stop: Traversal => Traversal = _.hasLabel("region")
      try {
        val stopSet = Traversal(gc, gc.vertices, isEdge = false)
          .where(stop).df.select(col("id")).localCheckpoint()
        var frontierIds = g.vertices
          .filter(col("label") === "customer" && col("mktsegment") === "BUILDING")
          .select(col("id")).dropDuplicates("id").localCheckpoint()
        var visited = frontierIds
        var halted: Option[DataFrame] = None
        var depth = 0
        while (depth < 50 && !frontierIds.isEmpty) {
          val frontierV = gc.vertices.join(frontierIds, Seq("id"), "left_semi")
          val stepped = Traversal(gc, frontierV, isEdge = false)
            .out("located_in", "part_of")
          val nextIds = stepped.df.select(col("id")).dropDuplicates("id")
            .join(visited, Seq("id"), "left_anti")
            .localCheckpoint()
          val stopIds = nextIds.join(stopSet, Seq("id"), "left_semi")
          halted = Some(halted.map(_.union(stopIds)).getOrElse(stopIds))
          visited = visited.union(nextIds)
          frontierIds = nextIds.join(stopSet, Seq("id"), "left_anti")
          depth += 1
        }
        val ids = halted.get
        g.vertices.join(ids, Seq("id"), "left_semi")
          .select(col("id")).orderBy(col("id")).localCheckpoint(true)
      } finally {
        loopE.unpersist(blocking = true)
        loopV.unpersist(blocking = true)
      }
    }

    def g52New(): DataFrame = {
      val out = graft.SparkEntry.queries("g52_until_stop")(spark, dir)
      out.localCheckpoint(true)
    }

    val which = if (args.isEmpty) Seq("lpa", "pr") else args.toSeq
    which.foreach { w =>
      val (fa, fb): (() => DataFrame, () => DataFrame) = w match {
        case "lpa" => (() => lpaOld(), () => lpaNew())
        case "pr" => (() => prOld(), () => prNew())
        case "louvain" => (() => louvainOld(), () => louvainNew())
        case "tri" => (() => triFrom(false), () => triFrom(true))
        case "g18" => (() => g18Old(), () => g18New())
        case "g18b" => (() => g18R15(), () => g18New())
        case "prb" => (() => prR15(), () => prNew())
        case "lpab" => (() => lpaNew(), () => lpaTwoLevel())
        case "g52b" => (() => g52R15(), () => g52New())
        case "prn" => (() => prParts(false), () => prParts(true))
        // g18 with AQE on (current) vs OFF for the whole query: the
        // JobProbe decomposition shows ~80% of g18's job time in
        // tiny AQE-stage/broadcast futures (~17/round) — this tests
        // whether adaptive re-planning is net overhead for the
        // checkpoint-rooted BFS round plans (static planner still
        // broadcasts small frontiers off LogicalRDD stats).
        case "g18aqe" => (
          () => g18New(),
          () => {
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            try g18New()
            finally spark.conf.set("spark.sql.adaptive.enabled", "true")
          })
        case "praqe" => (
          () => prParts(true),
          () => {
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            try prParts(true)
            finally spark.conf.set("spark.sql.adaptive.enabled", "true")
          })
      }
      // warmup both once
      noop(fa()); noop(fb())
      val as = scala.collection.mutable.ArrayBuffer.empty[Double]
      val bs = scala.collection.mutable.ArrayBuffer.empty[Double]
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime(); noop(fa()); as += (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime(); noop(fb()); bs += (System.nanoTime() - t1) / 1e9
      }
      println(f"$w%-4s OLD min=${as.min}%6.2f runs=${as.map(x => f"$x%.2f").mkString(",")}")
      println(f"$w%-4s NEW min=${bs.min}%6.2f runs=${bs.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
