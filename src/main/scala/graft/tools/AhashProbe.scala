package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnosis artifact for the m8_phash 10× blowup (round 10): the
  * banded hamming join's candidate volume is Σ_buckets n_b², and the
  * aHash space over this corpus is TINY — the synthetic rasters are
  * built from a 31-word vocabulary, so thousands of images collapse
  * onto a handful of distinct 64-bit hashes. Replicating the corpus
  * 10× grows every bucket 10× and the candidate volume 100× — the
  * measured 0.9 s → 19-32 s step is that quadratic surfacing, not a
  * constant-factor regression.
  *
  * The fix this probe motivates: group identical hashes FIRST
  * (distinct-hash compression), run the banded join over the distinct
  * hashes only (the candidate space stops scaling with corpus size —
  * it scales with CONTENT diversity), and expand per-image near-dup
  * counts from group sizes: n_neardup(img in g) = (sz(g) − 1) +
  * Σ_{g' ≠ g, ham ≤ 3} sz(g'). Output is bit-identical; the oracle's
  * all-pairs replay is untouched.
  *
  * Run: sbt "runMain graft.tools.AhashProbe [sfDir]"
  */
object AhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, dir)
    val h = graft.operators.Multimodal.imageAhash(spark,
      graft.operators.Multimodal.toPgm(
        graft.operators.Multimodal.mediaTable(docs))).toDF()
      .select(col("media_id"), col("ahash_lo"), col("ahash_hi"))
      .localCheckpoint(true)
    val nImg = h.count()
    val nDistinct = h.select(col("ahash_lo"), col("ahash_hi"))
      .distinct().count()
    // candidate volume of the IMAGE-level banded join: per 16-bit
    // chunk key, bucket size squared, summed
    def bucketVolume(frame: org.apache.spark.sql.DataFrame): Long = {
      val chunks = array((0 until 4).map { c =>
        val half = if (c < 2) col("ahash_lo") else col("ahash_hi")
        struct(lit(c).as("chunk"),
          shiftright(half, (c % 2) * 16).bitwiseAND(0xffffL).as("key"))
      }: _*)
      frame.select(explode(chunks).as("cb"))
        .groupBy(col("cb.chunk"), col("cb.key"))
        .agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * col("n"))).head().getLong(0)
    }
    val volImages = bucketVolume(h)
    val volGroups = bucketVolume(
      h.select(col("ahash_lo"), col("ahash_hi")).distinct())
    System.err.println(f"[ahash-probe] $dir")
    System.err.println(f"[ahash-probe] images=$nImg%,d distinct hashes=$nDistinct%,d")
    System.err.println(f"[ahash-probe] banded candidate volume, image-level = $volImages%,d")
    System.err.println(f"[ahash-probe] banded candidate volume, group-level = $volGroups%,d")
    spark.stop()
  }
}
