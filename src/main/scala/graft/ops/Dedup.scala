package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for web-scale corpora: exact (content-hash),
 * near-duplicate via MinHash+LSH banding, SimHash sketches, and blocked
 * n-gram Jaccard.
 *
 * Scale design (the part that matters at 100 TB):
 *  - Exact dedup is a hash-partitioned `row_number() = 1` on the content key —
 *    one shuffle by key, no global sort.
 *  - Near-dup candidate generation NEVER does an all-pairs join. MinHash
 *    signatures are banded and candidates are pairs that collide in ≥1 band —
 *    a self-equi-join on (band, bandKey), which shuffles each doc `bands`
 *    times instead of comparing N² pairs. With b bands of r rows, the
 *    candidate probability of a pair with Jaccard j is 1-(1-j^r)^b — the
 *    standard S-curve; tune (b, r) to the target threshold.
 *  - Verification (true Jaccard) runs only on the candidate set.
 *  - All hashes are md5-derived (see [[TextOps.hash32]]) — deterministic
 *    across engines and restarts, so incremental dedup runs agree.
 */
object Dedup {

  /** Large prime modulus for the affine minhash family (2^31 - 1). */
  val Prime: Long = 2147483647L

  /** Affine permutation family: h_i(x) = (a_i·x + b_i) mod P with fixed,
    * engine-portable coefficients. */
  def affine(i: Int, h: Column): Column =
    (h * lit(2L * i + 1) + lit(98765L * i + 12345L)) % lit(Prime)

  /**
   * Keeps one row per `key` — the one with the smallest `orderCol`
   * (deterministic winner, matching "first seen" under a total order).
   */
  def exact(df: DataFrame, key: Column, orderCol: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(orderCol.asc)
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
  }

  /** Exact content dedup: one row per distinct text (by md5), smallest id wins. */
  def exactByContent(df: DataFrame, idCol: String, textCol: String): DataFrame =
    exact(df, md5(col(textCol)), col(idCol))

  /**
   * MinHash signatures as `numHashes` rows per document:
   * `(id, i, mh)` where `mh = min over shingles of h_i(hash32(shingle))`.
   * Long format keeps the aggregation a plain partial-aggregatable min —
   * no per-row array state.
   */
  def minhashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, shingle: Int = 3): DataFrame = {
    val shingled = df
      .select(col(idCol).as("id"),
        explode(array_distinct(TextOps.wordShingles(col(textCol), shingle))).as("sh"))
      .withColumn("h", TextOps.hash32(col("sh")))
    val perHash = shingled.select(
      col("id"),
      explode(array((0 until numHashes).map(lit): _*)).as("i"),
      col("h"))
    perHash
      .groupBy("id", "i")
      .agg(min(affine0(col("i"), col("h"))).as("mh"))
  }

  /** affine() with the hash index as a column (runtime i). */
  private def affine0(i: Column, h: Column): Column =
    (h * (i * 2 + 1) + (i * lit(98765L) + lit(12345L))) % lit(Prime)

  /**
   * LSH banding: groups each document's signature into `bands` bands of
   * `numHashes/bands` rows and emits `(id, band, band_key)` where band_key is
   * the order-fixed concatenation of the band's minhashes.
   */
  def lshBands(signatures: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    signatures
      .withColumn("band", (col("i") / rows).cast("int"))
      .groupBy("id", "band")
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("i"), col("mh")))),
            s => s.getField("mh").cast("string")),
          ",").as("band_key"))
  }

  /**
   * Candidate near-duplicate pairs: documents sharing at least one LSH band.
   * The self-join is an equi-join on (band, band_key) — never all-pairs.
   */
  def candidatePairs(bands: DataFrame): DataFrame = {
    val a = bands.select(col("band"), col("band_key"), col("id").as("id_a"))
    val b = bands.select(col("band"), col("band_key"), col("id").as("id_b"))
    a.join(b, Seq("band", "band_key"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /**
   * True Jaccard similarity over word shingles for a given pair set —
   * verification stage of the MinHash pipeline, cost ∝ candidate pairs, not N².
   */
  def verifyJaccard(
      pairs: DataFrame, df: DataFrame, idCol: String, textCol: String,
      shingle: Int = 3): DataFrame = {
    val sh = df.select(
      col(idCol).as("id"),
      explode(array_distinct(TextOps.wordShingles(col(textCol), shingle))).as("sh"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(sh.select(col("id").as("id_a"), col("sh")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh")), Seq("id_b", "sh"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(inter, Seq("id_a", "id_b"), "left")
      .na.fill(0L, Seq("inter"))
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), "id_b")
      .select(
        col("id_a"), col("id_b"),
        (col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
          .as("jaccard"))
  }

  /**
   * End-to-end MinHash-LSH near-dup detection: signatures → bands → candidate
   * pairs → Jaccard verification ≥ `threshold`.
   */
  def nearDuplicates(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 8, shingle: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val sigs = minhashSignatures(df, idCol, textCol, numHashes, shingle)
    val cands = candidatePairs(lshBands(sigs, numHashes, bands))
    verifyJaccard(cands, df, idCol, textCol, shingle)
      .where(col("jaccard") >= threshold)
  }

  /**
   * 32-bit SimHash sketch per document: each token's 32-bit hash votes
   * ±count on every bit position; the sketch keeps the sign. Documents
   * within a small Hamming distance are near-duplicates. Emitted as a long.
   *
   * Built with explode over (token-counts × 32 bit positions) + one grouped
   * conditional sum — all codegen'd, no UDF bit twiddling.
   */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokCounts = df
      .select(col(idCol).as("id"), explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy("id", "tok")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("h", TextOps.hash32(col("tok")))
    val bits = tokCounts.select(
      col("id"), col("cnt"), col("h"),
      explode(array((0 until 32).map(lit): _*)).as("j"))
    // Bit extraction via power-of-two division: h < 2^32 and 2^j are exact
    // doubles, and dividing by a power of two only shifts the exponent, so
    // (h / 2^j) is exact and the truncating long cast is a clean right-shift.
    val pow2j = pow(lit(2d), col("j")).cast("long")
    bits
      .withColumn(
        "vote",
        when((col("h") / pow2j).cast("long") % 2 === 1, col("cnt"))
          .otherwise(-col("cnt")))
      .groupBy("id", "j")
      .agg(sum(col("vote")).as("v"))
      .groupBy("id")
      .agg(sum(when(col("v") > 0, pow(lit(2d), col("j")).cast("long")).otherwise(0L))
        .as("simhash"))
  }
}
