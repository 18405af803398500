package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Large-scale deduplication operators (driver mandate, SURVEY §2.11/§7.1-8).
  *
  * All operators are pure DataFrame transforms built from codegen'd
  * `functions._` expressions — no UDFs — so they whole-stage-compile and
  * scale by shuffle on content keys:
  *
  *  - exact:   shuffle on content hash, one aggregation.
  *  - minhash: per-doc signature (map-side, no shuffle) → explode bands
  *             (×B rows) → shuffle on (band, bucket) → within-bucket join.
  *             At 100 TB the band join is the only shuffle, keyed by band
  *             hash (uniform), and bucket sizes are bounded by banding.
  *  - simhash: per-doc 64-bit signature, band-grouped for candidate pairs.
  */
object Dedup {

  // -------------------------------------------------------------------------
  // shingling
  // -------------------------------------------------------------------------

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Word n-gram shingles as strings ("w1 w2 ... wn"), distinct. */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    array_distinct(
      when(size(t) < n, array(concat_ws(" ", t)))
        .otherwise(transform(sequence(lit(1), size(t) - (n - 1)),
          i => concat_ws(" ", slice(t, i, lit(n))))))
  }

  // -------------------------------------------------------------------------
  // exact dedup
  // -------------------------------------------------------------------------

  /** Exact duplicate groups by content hash: keeps the smallest id per
    * group. One shuffle on the 128-bit content hash. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  // -------------------------------------------------------------------------
  // MinHash + LSH
  // -------------------------------------------------------------------------

  /** MinHash signature over word shingles — native one-pass expression
    * (graft.functions.MinHashSignature): tokens hashed once, shingles are
    * hash-chains (never materialized), k permutations by double hashing. */
  def minhashSignature(text: Column, numHashes: Int, shingleN: Int): Column =
    graft.functions.TextHashFunctions.minhash_signature(tokens(text), numHashes, shingleN)

  /** Estimated Jaccard from two minhash signatures. */
  def minhashJaccard(sigA: Column, sigB: Column): Column =
    aggregate(zip_with(sigA, sigB, (a, b) => when(a === b, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast(DoubleType) / size(sigA)

  /** Near-duplicate pairs via MinHash LSH banding.
    *
    * numHashes = bands * rowsPerBand. A pair lands in the same bucket for a
    * band iff that band's rows all match; pairs are then verified on the
    * full signature against `threshold`.
    *
    * Output: (id_a, id_b, est_jaccard), id_a < id_b.
    */
  def minhashDupPairs(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleN: Int = 3,
      threshold: Double = 0.7): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")

    val sigs = df.select(col(idCol).as("id"),
      minhashSignature(col(textCol), numHashes, shingleN).as("sig"))

    // one row per (doc, band): bucket key = native band hash of the slice
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(graft.functions.TextHashFunctions.band_keys(col("sig"), bands))
        .as(Seq("band", "bucket")))

    val l = banded.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sig").as("sig_b"))

    // threshold BEFORE the pair-dedup shuffle: only matching pairs move
    l.join(r, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        minhashJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
      .groupBy("id_a", "id_b")                      // same pair from many bands
      .agg(first("est_jaccard").as("est_jaccard"))
  }

  /** Connected-component-free dedup decision: drop any doc that pairs with a
    * smaller-id near-duplicate. Returns the surviving ids. */
  def minhashSurvivors(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleN: Int = 3,
      threshold: Double = 0.7): DataFrame = {
    val dups = minhashDupPairs(df, textCol, idCol, numHashes, bands, shingleN, threshold)
      .select(col("id_b").as("drop_id")).distinct()
    df.join(dups, df(idCol) === dups("drop_id"), "left_anti")
  }

  // -------------------------------------------------------------------------
  // n-gram Jaccard (exact)
  // -------------------------------------------------------------------------

  /** Exact Jaccard similarity over word n-gram shingle sets for all pairs of
    * a (pre-filtered, small) candidate set. Quadratic — gate the input or
    * feed it LSH candidates. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      shingleN: Int, threshold: Double): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), shingleN).as("sh"))
    val l = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val r = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    l.crossJoin(r).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  // -------------------------------------------------------------------------
  // SimHash
  // -------------------------------------------------------------------------

  /** 64-bit SimHash over tokens: bit b is set iff the sum over tokens of
    * ±1 (per token-hash bit b) is positive. Packed into a long.
    * One pass over tokens: per-token hash folded into 64 bit-sums via an
    * array accumulator, then packed (bit positions are compile-time ints,
    * so the whole thing stays a codegen'd expression). */
  def simhash(text: Column): Column =
    graft.functions.TextHashFunctions.simhash64(array_distinct(tokens(text)))

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: candidates share one of 4 16-bit bands, then
    * verified by Hamming distance <= maxHamming. */
  def simhashDupPairs(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sig"), b * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("band", "bucket")))
    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    // hamming filter BEFORE the pair-dedup shuffle
    l.join(r, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("sig_a"), col("sig_b")).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .groupBy("id_a", "id_b").agg(first("hamming").as("hamming"))
  }
}
