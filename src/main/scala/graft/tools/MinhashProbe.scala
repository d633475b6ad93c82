package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev probe: where does d5_minhash_pairs spend its time at sf0.1 —
  * shingling, the 64-min signature agg, banding/candidates, or the
  * exact-Jaccard verify join? Times each prefix of the pipeline
  * (noop-materialized, median of 3 after one warm run).
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, dir)

    def time(name: String)(f: () => org.apache.spark.sql.DataFrame): Unit = {
      f().write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$name%-28s median=${ts(1)}%6.2fs  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    time("shingleRows")(() => Dedup.shingleRows(docs, 1))
    time("shingle+md5hash")(() => Dedup.shingleRows(docs, 1)
      .select(col("doc_id"), Dedup.portableTokenHash(col("s")).as("h")))
    time("signatures(64min)")(() => Dedup.minhashSignatures(
      docs, 1, 64, Dedup.portableTokenHash))
    time("signatures(xxhash)")(() => Dedup.minhashSignatures(
      docs, 1, 64, Dedup.fastTokenHash))
    time("full d5 (portable)")(() => Dedup.minhashNearDup(
      docs, 1, 64, 8, 0.9, 500, Dedup.portableTokenHash))

    // replicate the banding internals to localize the 4s gap between
    // signatures (~1s) and the full pipeline (~5s)
    val bands = 8; val rows = 8
    def buckets() = {
      val sigs = Dedup.minhashSignatures(docs, 1, 64, Dedup.portableTokenHash)
      val bandStructs = array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(lit(b) +: (0 until rows).map(r =>
            col("signature").getItem(b * rows + r)): _*).as("bucket"))
      }: _*)
      sigs.select(col("doc_id"), explode(bandStructs).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"),
          col("bb.bucket").as("bucket"))
    }
    def cands() = {
      val sized = buckets()
        .withColumn("bsize", count(lit(1))
          .over(org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")))
        .filter(col("bsize") <= 500)
        .drop("bsize")
      val a = sized.select(col("band"), col("bucket"), col("doc_id").as("a_id"))
      val b = sized.select(col("band"), col("bucket"), col("doc_id").as("b_id"))
      a.join(b, Seq("band", "bucket"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"))
        .dropDuplicates("a_id", "b_id")
    }
    time("buckets")(() => buckets())
    time("cands")(() => cands())
    println(s"n_cands=${cands().count()}")

    def sigck() = Dedup.minhashSignatures(docs, 1, 64, Dedup.portableTokenHash)
      .localCheckpoint()
    def candsEst(minMatch: Int) = {
      val sigs = sigck()
      val sa = sigs.select(col("doc_id").as("a_id"), col("signature").as("sig_a"))
      val sb = sigs.select(col("doc_id").as("b_id"), col("signature").as("sig_b"))
      val agree = (0 until 64).map(i =>
          when(col("sig_a").getItem(i) === col("sig_b").getItem(i), 1)
            .otherwise(0))
        .reduce(_ + _)
      cands().join(sa, "a_id").join(sb, "b_id")
        .filter(agree >= minMatch)
        .select(col("a_id"), col("b_id"))
    }
    def candsJoinOnly() = {
      val sigs = sigck()
      val sa = sigs.select(col("doc_id").as("a_id"), col("signature").as("sig_a"))
      val sb = sigs.select(col("doc_id").as("b_id"), col("signature").as("sig_b"))
      cands().join(sa, "a_id").join(sb, "b_id")
        .select(col("a_id"), col("b_id"))
    }
    time("cands+sigjoins(nofilter)")(() => candsJoinOnly())
    time("cands_est48")(() => candsEst(48))
    println(s"n_est48=${candsEst(48).count()}")
    spark.stop()
  }
}
