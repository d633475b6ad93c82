package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosine kernel exact values") {
    val df = Seq((Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f)),
      (Array(1f, 0f, 0f), Array(-1f, 0f, 0f)))
      .toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
    val got = df.as[Double].collect()
    assert(got(0) == 0.0)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(got(2) == -1.0)
  }

  test("kcenterSelect: farthest-point picks span the clusters before filling in") {
    // three tight direction clusters; seed = min id (1, in cluster X).
    // pick 2 must come from the cluster LEAST similar to X, and after
    // 3 picks every cluster holds exactly one center.
    val df = Seq(
      (1L, Array(1f, 0.01f, 0f, 0f)), (2L, Array(1f, 0.02f, 0f, 0f)),
      (10L, Array(0f, 1f, 0.01f, 0f)), (11L, Array(0f, 1f, 0.02f, 0f)),
      (20L, Array(0f, 0f, 0.01f, 1f)), (21L, Array(0f, 0f, 0.02f, 1f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kcenterSelect(df, k = 3)
      .orderBy(col("pick")).as[(Int, Long, Long)].collect()
    assert(got.head._2 == 1L, "seed must be the min vec_id")
    assert(got.head._3 == -1000000L, "seed far_u is the sentinel")
    val clusters = got.map(_._2 / 10L).toSet
    assert(clusters == Set(0L, 1L, 2L),
      s"3 picks must span the 3 clusters, got ${got.toSeq}")
    // picked points' far_u reads near-orthogonal, not near-duplicate
    assert(got.tail.forall(_._3 < 100000L),
      s"spanning picks should be far from their centers: ${got.toSeq}")
  }

  test("kcenterSelect: k >= n degenerates to picking every point once") {
    val df = Seq((5L, Array(1f, 0f)), (6L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kcenterSelect(df, k = 2)
      .orderBy(col("pick")).as[(Int, Long, Long)].collect()
    assert(got.map(_._2).toSeq == Seq(5L, 6L))
  }

  test("mmrSelect: redundancy is penalized, plain relevance is not") {
    // candidates: 20/21 exact duplicates (cs = 1), 22 orthogonal to
    // them but still query-relevant. Relevance-only top-2 = {20, 21}
    // (tie → lower id first); MMR pick 2 must be 22: the duplicate's
    // score 0.75·0.781 − 0.25·1 = 0.336 loses to 22's unpenalized
    // 0.75·0.625 = 0.469.
    val cands = Seq(
      (20L, Array(1f, 0f, 0f, 0f)),
      (21L, Array(1f, 0f, 0f, 0f)),
      (22L, Array(0f, 1f, 0f, 0f))).toDF("vec_id", "embedding")
    val q = Seq((1L, Array(1f, 0.8f, 0f, 0f))).toDF("query_id", "query_vec")
    val got = Similarity.mmrSelect(q, cands, k = 3)
      .orderBy("pick").select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(20L, 22L, 21L), s"got $got")
    // scores are quarter-micro integers divided once: exact re-run
    val again = Similarity.mmrSelect(q, cands, k = 3)
      .orderBy("pick").as[(Long, Int, Long, Double)].collect().toSeq
    val first = Similarity.mmrSelect(q, cands, k = 3)
      .orderBy("pick").as[(Long, Int, Long, Double)].collect().toSeq
    assert(again == first)
  }

  test("brute-force top-k finds the planted nearest neighbor first") {
    val corpus = Seq(
      (10L, Array(1f, 0f, 0f, 0f)),
      (11L, Array(0.9f, 0.1f, 0f, 0f)), // nearest to query
      (12L, Array(0f, 1f, 0f, 0f)),
      (13L, Array(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val queries = Seq((10L, Array(1f, 0f, 0f, 0f))).toDF("query_id", "query_vec")
    val got = Similarity.bruteForceTopK(queries, corpus, 2)
      .orderBy("rank").select("vec_id").as[Long].collect()
    assert(got.toSeq == Seq(11L, 12L)) // excludes self (vec_id == query_id)
  }

  test("rangeSearch returns exactly the matches over the threshold") {
    val corpus = Seq(
      (10L, Array(1f, 0f, 0f, 0f)),   // self — excluded
      (11L, Array(0.9f, 0.1f, 0f, 0f)), // cos ≈ 0.994 — in
      (12L, Array(1f, 1f, 0f, 0f)),   // cos ≈ 0.707 — in
      (13L, Array(0f, 1f, 0f, 0f)),   // orthogonal — out
      (14L, Array(-1f, 0f, 0f, 0f))   // opposite — out
    ).toDF("vec_id", "embedding")
    val queries = Seq((10L, Array(1f, 0f, 0f, 0f))).toDF("query_id", "query_vec")
    val got = Similarity.rangeSearch(queries, corpus, 0.5)
      .as[(Long, Long, Double)].collect().sortBy(_._2)
    assert(got.map(_._2).toSeq == Seq(11L, 12L))
    assert(got.forall(_._3 >= 0.5))
    // a query with no matches yields zero rows, not a null row
    val far = Seq((99L, Array(0f, 0f, 0f, 1f))).toDF("query_id", "query_vec")
    assert(Similarity.rangeSearch(far, corpus, 0.9).count() == 0)
  }

  test("lsh top-k: identical vectors share a bucket and rank first") {
    val vecs = (0 until 32).map { i =>
      val v = new Array[Float](8); v(i % 8) = 1f; v((i + 3) % 8) = 0.5f
      (i.toLong, v)
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    // query 100 = exact copy of corpus vector 5
    val queries = Seq((100L, vecs(5)._2)).toDF("query_id", "query_vec")
    val got = Similarity.lshTopK(queries, corpus, 1, nBits = 6, dim = 8)
      .select("vec_id", "cosine").as[(Long, Double)].collect()
    assert(got.nonEmpty && got.head._2 == 1.0)
  }

  test("lsh recall vs brute force on real embeddings is quantified") {
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val exact = graft.operators.Similarity.bruteForceTopK(queries, emb, 1)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toMap
    val approx = graft.operators.Similarity.lshTopK(queries, emb, 1, nBits = 8)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toMap
    // multi-table multi-probe LSH (8 tables × 8 bits, ham≤1 probes):
    // measured 17/20 on this deterministic data+seed; assert a
    // conservative floor so regressions in the scheme surface
    val hits = exact.count { case (q, v) => approx.get(q).contains(v) }
    info(s"lsh top-1 recall: $hits/${exact.size}")
    assert(hits >= exact.size / 2, s"recall collapsed: $hits/${exact.size}")
  }

  test("e2 gate parameters hold a recall@3 floor vs e1 brute force") {
    // The e2 correctness gate replays the sign-LSH bit-for-bit in SQL —
    // exact but brittle by construction: a future corpus/seed change
    // that lands a dot product on the sign boundary of
    // `dot(v, plane) >= 0` flips a bucket and the hash diverges even
    // though the ANN is semantically fine. This spec is the SEMANTIC
    // backstop: at the gate's exact parameters (20 queries, k=3,
    // 8 tables × 8 bits, hamming-1 probes — PipelineQueries.e2LshTopk)
    // the approximate top-3 must keep finding the true top-3.
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    def top3(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, vs) => q -> vs.map(_._2).toSet }
    val exact = top3(Similarity.bruteForceTopK(queries, emb, 3))
    val approx = top3(Similarity.lshTopK(queries, emb, 3, nBits = 8))
    val found = exact.toSeq.map { case (q, vs) =>
      (vs & approx.getOrElse(q, Set.empty)).size
    }.sum
    val total = exact.valuesIterator.map(_.size).sum
    info(s"lsh recall@3 at gate params: $found/$total")
    // measured 42/60 on this deterministic data+seed; conservative
    // floor so a scheme regression (not seed noise) trips it
    assert(found * 2 >= total, s"recall@3 collapsed: $found/$total")
  }

  test("large query set degrades to a shuffle join instead of broadcast") {
    val corpus = (0 until 64).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i + j).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = corpus
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    // maxBroadcastRows = 0 models a query set over the safety threshold.
    // Auto-broadcast is off for the assertion so only a HARD-CODED hint
    // (the old bug) could still produce a broadcast join.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = Similarity.lshTopK(queries, corpus, 1, nBits = 4, dim = 8,
          tables = 2, maxBroadcastRows = 0)
        .queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin"),
        s"query side must not carry a forced broadcast hint:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("k-means centroids separate planted clusters and are deterministic") {
    // three tight clusters around orthogonal axes
    val rows = (0 until 30).map { i =>
      val axis = i % 3
      val v = new Array[Float](6)
      v(axis) = 1f
      v(3 + axis) = 0.05f * (i / 3) // small within-cluster spread
      (i.toLong, v)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val cents = Similarity.trainCentroids(corpus, nCentroids = 3, iters = 3)
    val assigned = Similarity.assignCells(corpus, "embedding", cents)
      .select(col("vec_id"), col("centroid_id")).as[(Long, Long)].collect().toMap
    // every cluster lands wholly in one distinct cell
    val cells = (0 until 3).map(a => rows.collect {
      case (id, _) if id % 3 == a => assigned(id)
    }.toSet)
    assert(cells.forall(_.size == 1), s"clusters split across cells: $cells")
    assert(cells.flatten.toSet.size == 3, s"clusters merged: $cells")
    // determinism: retraining yields bit-identical centroids
    val again = Similarity.trainCentroids(corpus, nCentroids = 3, iters = 3)
    assert(cents.map(_._2.toSeq).toSeq == again.map(_._2.toSeq).toSeq)
  }

  test("seeding yields k DISTINCT seeds whenever the corpus has k " +
       "distinct vectors, despite hash-bucket collisions") {
    // n == k is the worst case for the stratified oversample: expected
    // non-empty buckets B(1-(1-1/B)^n) < k, so without the global
    // farthest-k floor the pool runs short and seeds get padded with
    // duplicates of seed 0 even though unpicked distinct vectors exist
    val k = 64
    val corpus = (0 until k).map { i =>
      val v = new Array[Float](8)
      v(i % 8) = 1f; v((i + 3) % 8) = 0.1f * (i / 8 + 1)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val seeds = Similarity.trainCentroids(corpus, nCentroids = k, iters = 0)
    assert(seeds.length == k)
    assert(seeds.map(_._2.toSeq).distinct.length == k,
      "duplicate seeds padded while distinct corpus vectors remained")
  }

  test("ivf top-k returns k ranked candidates per query") {
    val corpus = (0 until 64).map { i =>
      val v = Array.tabulate(8)(j => math.cos(i * (j + 1)).toFloat)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val queries = corpus.limit(3)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val got = Similarity.ivfTopK(queries, corpus, 3, nCentroids = 4)
    val counts = got.groupBy("query_id").count().select("count").as[Long].collect()
    assert(counts.forall(_ <= 3) && counts.nonEmpty)
  }

  test("ivfTopKSeeded: full probe coverage equals brute force; fewer probes search a subset") {
    // two tight clusters on orthogonal axes; seeds 0 and 1 land in
    // different clusters, so nprobe=2 covers the whole corpus and the
    // seeded IVF must return EXACTLY the brute-force answer
    val corpus = (0 until 20).map { i =>
      val v = new Array[Float](4)
      v(i % 2) = 1f; v(2 + i % 2) = 0.01f * i
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val exact = Similarity.bruteForceTopK(queries, corpus, 3)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)]
      .collect().toSet
    val seeded = Similarity.ivfTopKSeeded(queries, corpus, 3,
        nCentroids = 2, nprobe = 2)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)]
      .collect().toSet
    assert(seeded == exact, "nprobe covering all cells must equal brute force")
    // nprobe=1 restricts each query to its own cluster's cell
    val oneCell = Similarity.ivfTopKSeeded(queries, corpus, 3,
        nCentroids = 2, nprobe = 1)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
    assert(oneCell.forall { case (q, v) => (q % 2) == (v % 2) },
      "single-probe candidates must come from the query's own cell")
  }

  test("ivf (trained) and seeded-ivf recall vs brute force on real embeddings") {
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val exact = Similarity.bruteForceTopK(queries, emb, 1)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toMap
    def recall(df: org.apache.spark.sql.DataFrame): Int = {
      val top = df.filter(col("rank") === 1)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toMap
      exact.count { case (q, v) => top.get(q).contains(v) }
    }
    // the trained-quantizer production path: recall floor pinned here
    // because its iterated float means are not SQL-replayable (the
    // seeded gate path is hash-oracled by the driver instead).
    // These embeddings are weakly clustered (near-random 64-dim), the
    // worst case for IVF — measured trained recall by nprobe on this
    // corpus: 1→6, 2→8, 3→13, 4→15, 6→18, 8(=all)→20 of 20; the spec
    // probes 4 of 8 cells and asserts the half-way floor so a scheme
    // regression (not a data property) is what trips it
    val trained = recall(Similarity.ivfTopK(queries, emb, 1, nprobe = 4))
    info(s"trained-ivf top-1 recall (nprobe=4): $trained/${exact.size}")
    assert(trained >= exact.size / 2, s"recall collapsed: $trained/${exact.size}")
    val seeded = recall(Similarity.ivfTopKSeeded(queries, emb, 1, nprobe = 4))
    info(s"seeded-ivf top-1 recall (nprobe=4): $seeded/${exact.size}")
    assert(seeded >= exact.size / 2, s"recall collapsed: $seeded/${exact.size}")
  }

  test("pqEncode: a seed vector encodes to its own codebook entry") {
    // corpus whose first 4 rows are axis-aligned unit vectors → the
    // seeded codebook's subspace entries are those slices; re-encoding
    // a seed must pick its own code (dot with itself is max), and a
    // near-copy of seed 2 must code like seed 2 in every subspace
    val dim = 8
    def axis(i: Int) = Array.tabulate(dim)(j => if (j == i) 1f else 0f)
    val corpus = ((0 until 4).map(i => (i.toLong, axis(i))) :+
      (9L, axis(2).map(x => x * 0.9f))).toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebook(corpus, nSub = 2, dsub = 4, ksub = 4)
    val codes = Similarity.pqEncode(corpus, "embedding", cb, dsub = 4)
      .select("vec_id", "c0", "c1").as[(Long, Int, Int)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // seed 2 = axis(2): subspace 0 holds its mass → c0 = 2; subspace 1
    // is all-zero → ties resolve to code 0
    assert(codes(2L) == ((2, 0)))
    assert(codes(9L) == ((2, 0)), "a scaled copy must share its seed's codes")
  }

  test("pq top-k: recall@3 floor vs brute force at the e8 gate params") {
    // The e8 gate replays the PQ scheme bit-for-bit in SQL — exact but
    // blind to semantic quality. This is the semantic backstop at the
    // gate's parameters (20 queries, k=3, 8×8 sub-codebooks of 16
    // entries, ADC rerank 10) on the corpus PQ likes least:
    // weakly-clustered near-random embeddings.
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    def top3(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, vs) => q -> vs.map(_._2).toSet }
    val exact = top3(Similarity.bruteForceTopK(queries, emb, 3))
    val approx = top3(Similarity.pqTopKSeeded(queries, emb, 3))
    val found = exact.toSeq.map { case (q, vs) =>
      (vs & approx.getOrElse(q, Set.empty)).size
    }.sum
    val total = exact.valuesIterator.map(_.size).sum
    info(s"pq recall@3 at gate params: $found/$total")
    assert(found * 5 >= total,
      s"recall@3 collapsed below the 20% floor: $found/$total")
  }

  test("trained PQ codebooks: recall quantified vs seeded on real embeddings") {
    // production face (per-subspace Lloyd) vs the SQL-replayable seeded
    // gate face — same split as trained-vs-seeded IVF
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    def top3(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, vs) => q -> vs.map(_._2).toSet }
    val exact = top3(Similarity.bruteForceTopK(queries, emb, 3))
    def recall(approx: Map[Long, Set[Long]]): Int =
      exact.toSeq.map { case (q, vs) =>
        (vs & approx.getOrElse(q, Set.empty)).size
      }.sum
    val seeded = recall(top3(Similarity.pqTopKSeeded(queries, emb, 3)))
    val trained = recall(top3(Similarity.pqTopK(queries, emb, 3)))
    val total = exact.valuesIterator.map(_.size).sum
    info(s"pq recall@3 seeded=$seeded/$total trained=$trained/$total")
    // training must not collapse recall. Measured on this corpus:
    // seeded 24/60, trained 22/60 — near-random embeddings are PQ's
    // worst case and L2-style Lloyd means shrink centroid norms, which
    // slightly biases DOT-based ADC scores; on clustered corpora the
    // trained codebooks win. The slack absorbs that ±, the floor
    // catches a real collapse.
    assert(trained + 3 >= seeded, s"trained $trained < seeded $seeded - 3")
    assert(trained * 5 >= total, s"trained recall below 20%: $trained/$total")
  }

  test("pq top-k: an exact duplicate of the query ranks first") {
    // a corpus clone of the query shares every code → max ADC score →
    // survives to rerank, where exact cosine 1.0 pins rank 1
    val rnd = new scala.util.Random(7)
    val corpus = (0 until 64).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat))
    }
    val clone = (99L, corpus(40)._2.clone())
    val df = (corpus :+ clone).toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") === 40L)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val top = Similarity.pqTopKSeeded(q, df, 1, nSub = 4, dsub = 4, ksub = 8)
      .select("vec_id").as[Long].collect()
    assert(top.sameElements(Array(99L)), s"clone not found: ${top.toSeq}")
  }

  test("ivf-pq: recall@3 floor at gate params; exact in the full-probe full-rerank limit") {
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    val n = emb.count().toInt
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    def top3(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, vs) => q -> vs.map(_._2).toSet }
    val exact = top3(Similarity.bruteForceTopK(queries, emb, 3))
    // gate params: cells prune to 2/8 of the corpus, PQ ranks inside
    val approx = top3(Similarity.ivfPqTopKSeeded(queries, emb, 3))
    val found = exact.toSeq.map { case (q, vs) =>
      (vs & approx.getOrElse(q, Set.empty)).size
    }.sum
    val total = exact.valuesIterator.map(_.size).sum
    info(s"ivf-pq recall@3 at gate params: $found/$total")
    assert(found * 5 >= total,
      s"recall@3 collapsed below the 20% floor: $found/$total")
    // probe every cell and rerank everything → the PQ/IVF approximations
    // vanish and the result must EQUAL brute force row-for-row
    val full = top3(Similarity.ivfPqTopKSeeded(queries, emb, 3,
      nprobe = 8, rerank = n))
    assert(full == exact, "full-probe full-rerank must equal brute force")
  }

  test("semdedupPrune: within-cell near-dup pruned, cross-cell kept") {
    val corpus = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),          // centroid of cell 0
      (1L, Array(0f, 1f, 0f, 0f)),          // centroid of cell 1
      (2L, Array(0.9f, 0.1f, 0f, 0f)),      // cell 0, cos≈0.994 to v0
      (3L, Array(0f, 0.9f, 0.3f, 0f)),      // cell 1, cos≈0.949 to v1
      (4L, Array(0.6f, 0f, 0.8f, 0f)),      // cell 0, cos 0.6 — kept
      (5L, Array(0.9f, 0.1f, 0f, 0f)))      // clone of 2 → pruned by 0
      .toDF("vec_id", "embedding")
    val got = Similarity.semdedupPrune(corpus, tau = 0.9, nCentroids = 2)
      .orderBy("vec_id")
      .select("cell", "vec_id", "pruned_by", "max_cos")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.map(_._2).toSeq == Seq(2L, 3L, 5L), s"wrong prune set: ${got.toSeq}")
    assert(got.forall { case (_, v, by, _) => by < v })
    val v5 = got.find(_._2 == 5L).get
    assert(v5._3 == 0L && v5._4 == 1.0, s"clone must report its min pruner: $v5")
    // v4 survives: its best within-cell cosine (0.6) is under tau
  }

  test("semdedupPrune: shard guard bounds an oversized cell") {
    // one cell, 12 near-identical vectors, maxCellSize 4 → 3+ shards;
    // the quadratic term is bounded and pruning still happens inside
    // each shard (the documented recall trade of sharding)
    val base = Array.tabulate(8)(j => math.cos(j).toFloat)
    val corpus = (0 until 12).map { i =>
      (i.toLong, base.map(x => x + i * 1e-4f))
    }.toDF("vec_id", "embedding")
    val unsharded = Similarity.semdedupPrune(corpus, tau = 0.99, nCentroids = 1)
      .select("vec_id").as[Long].collect().toSet
    val sharded = Similarity.semdedupPrune(corpus, tau = 0.99, nCentroids = 1,
        maxCellSize = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(unsharded.size == 11, s"all non-min ids prune unsharded: $unsharded")
    assert(sharded.subsetOf(unsharded) && sharded.nonEmpty,
      s"sharded prune must be a nonempty subset: $sharded")
  }

  test("quantizeInt8: hand-computed codes, saturation, zero vector") {
    val df = Seq(
      (1L, Array(1f, -2f, 4f)),
      (2L, Array(0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(df).orderBy("vec_id")
      .as[(Long, Double, Long, Long, Long)].collect()
    // vec 1: scale 4 → codes floor([31.75,-63.5,127]+0.5) = [32,-63,127]
    assert(got(0) == ((1L, 4.0, 222L, 32L - 126L + 381L, 1L)))
    // zero vector: all-zero codes, no division by zero
    assert(got(1) == ((2L, 0.0, 0L, 0L, 0L)))
  }

  test("rproj: Scala-replayed integer sums, sign determinism, negation") {
    import org.apache.spark.sql.Row
    // values avoid the exact-.5 micro boundary so q(-x) == -q(x)
    val vecs = Seq(
      (1L, Array(0.25f, -0.125f, 0.75f, 0.0625f)),
      (2L, Array(-0.25f, 0.125f, -0.75f, -0.0625f)),
      (3L, Array(0.25f, -0.125f, 0.75f, 0.0625f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.rproj(vecs, k = 4).orderBy(col("vec_id"))
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong).toSeq)
      .toMap
    def q(x: Double): Long = math.floor(x * 1000000d + 0.5d).toLong
    val xs = Seq(0.25, -0.125, 0.75, 0.0625)
    val want = (0 until 4).map { j =>
      xs.zipWithIndex.map { case (x, i) =>
        q(x) * Similarity.rprojSign(i, j)
      }.sum
    }
    assert(got(1L) == want, s"got ${got(1L)} want $want")
    assert(got(2L) == want.map(-_)) // linearity under negation
    assert(got(3L) == got(1L)) // identical inputs project identically
    // the sign matrix is genuinely mixed (not all +1 / all -1)
    val signs = for (i <- 0 until 4; j <- 0 until 4)
      yield Similarity.rprojSign(i, j)
    assert(signs.contains(1L) && signs.contains(-1L))
  }

  test("kmeansExact: integer Lloyd separates blobs; hand-replayed metrics") {
    // two tight blobs in dim 4; both seeds (vec 0, vec 1) start inside
    // blob A, so convergence requires the update rounds to actually
    // move centroid 1 across to blob B
    val df = Seq(
      (0L, Array(0f, 0f, 0f, 0f)),
      (1L, Array(0.001f, 0f, 0f, 0f)),
      (2L, Array(1f, 1f, 1f, 1f)),
      (3L, Array(1.001f, 1f, 1f, 1f)),
      (4L, Array(1f, 1f, 1f, 1.001f)),
      (5L, Array(0f, 0.001f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kmeansExact(df, k = 2, iters = 2)
      .orderBy("centroid_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // hand replay (milli coords; div truncates): round 1 assigns
    // {0,5}→c0, {1,2,3,4}→c1 (B-blob is 999²+3e6 < 4e6 to seed 1);
    // round 2 means pull c1 to (750,750,750,750) → {0,1,5} vs {2,3,4};
    // final centroids (0,0,0,0) and (1000,1000,1000,1000), each blob
    // contributing two 1-milli offsets → inertia 2 per cluster
    assert(got == Seq((0L, 3L, 0L, 2L), (1L, 3L, 4000L, 2L)), s"got $got")
  }

  test("pcaTopComponent: axis-aligned corpus recovers the axis") {
    // all mass on dim 0: G = diag(3e6, 0); one iteration fixes
    // x = (1000, 0) and every later round is a fixpoint
    val df = Seq(
      (0L, Array(1f, 0f)), (1L, Array(1f, 0f)), (2L, Array(1f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.pcaTopComponent(df, iters = 3)
      .orderBy("dim").as[(Int, Long)].collect().toSeq
    assert(got == Seq((0, 1000L), (1, 0L)), s"got $got")
  }

  test("pcaTopComponent: diagonal corpus converges to the (1,1) direction") {
    // q rows (500,500) and (1000,1000): G is the constant 1.25e6
    // matrix; rescale halves it; the all-ones start is already the
    // eigenvector -> (1000, 1000) every round
    val df = Seq((0L, Array(0.5f, 0.5f)), (1L, Array(1f, 1f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.pcaTopComponent(df, iters = 2)
      .orderBy("dim").as[(Int, Long)].collect().toSeq
    assert(got == Seq((0, 1000L), (1, 1000L)), s"got $got")
  }

  test("pcaTopComponent: dominant direction wins from a mixed start") {
    // 4 rows on dim 1, 1 row on dim 0 -> top eigenvector is dim 1;
    // the all-ones start has overlap with it, so iteration drives
    // dim 0's weight toward 0 and dim 1's to the 1000 cap
    val df = Seq(
      (0L, Array(1f, 0f)),
      (1L, Array(0f, 1f)), (2L, Array(0f, 1f)),
      (3L, Array(0f, 1f)), (4L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.pcaTopComponent(df, iters = 8)
      .orderBy("dim").as[(Int, Long)].collect().toMap
    assert(got(1) == 1000L, s"got $got")
    assert(got(0) < 10L, s"got $got") // (1/4)^8 of the start overlap
  }

  test("removeTopComponent: axis-aligned vectors leave a zero residual") {
    // direction w = (1000, 0); for (2, 0): q = (2e6, 0), dot = 2e9,
    // xx = 1e6, c = 2e12 div 1e6 = 2e6, r = (1000·2e6 − 2e6·1000, 0)
    // = 0. The off-axis (0, 0.5) vector is untouched: dot = 0, c = 0,
    // r = (0, 5e8) -> l1 5e8, checksum 5e8·2
    val df = Seq(
      (0L, Array(1f, 0f)), (1L, Array(1f, 0f)), (2L, Array(2f, 0f)),
      (3L, Array(0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.removeTopComponent(df, iters = 3)
      .orderBy("vec_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 1000000L, 0L, 0L), (1L, 1000000L, 0L, 0L),
      (2L, 2000000L, 0L, 0L), (3L, 0L, 500000000L, 1000000000L)),
      s"got $got")
  }
}
