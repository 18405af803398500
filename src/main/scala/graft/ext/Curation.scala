package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: deterministic
  * sequence packing (token-budget batching) and per-group quota capping
  * (domain/language balancing). Both are pure DataFrame compositions —
  * window functions over one hash-partition shuffle — so Catalyst/Tungsten
  * own the physical plan and both have engine-independent semantics a SQL
  * oracle can replay exactly.
  */
object Curation {

  /** The Lehmer-stream samplers ([[mixtureSample]],
    * [[Vocabulary.dsirResample]]) seed their int64 stream from the id
    * column CAST to long — a non-numeric id (string/uuid) casts to null,
    * which would silently degrade the deterministic draw to "every key
    * null" (mixtureSample would keep nothing for fractional rates;
    * dsirResample would fall back to a plain id-ordered limit) with no
    * error. Fail loudly instead (ADVICE r10). */
  private[ext] def requireIntegralId(df: DataFrame, idCol: String,
      op: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"$op: id column '$idCol' must be integral (byte/short/int/long) — " +
        s"it seeds the deterministic Lehmer stream via a long cast, and " +
        s"a $dt would cast to null and silently corrupt the draw; " +
        "derive one first (e.g. xxhash64(uuid_col))")
  }

  /** Assign each document to a fixed-token-budget pack, deterministically.
    *
    * Contiguous bin packing: documents are sharded by `pmod(id, shards)`,
    * ordered by id within a shard, and a document goes to pack
    * `floor(cumulative_tokens_before_it / budgetTokens)` — i.e. packs are
    * filled left-to-right and a pack may overflow the budget by at most one
    * document (the standard greedy batching used to build training
    * sequences; splitting a document across packs is the tokenizer's job,
    * not the planner's).
    *
    * Scale shape: ONE shuffle (hash on the shard key), then a per-shard
    * sort that Spark's window exchange spills as needed. `shards` bounds
    * per-task state: at 100 TB pick shards so a shard's documents fit one
    * task's spill budget (e.g. 10k shards ≈ 10 GB/shard); packing quality
    * is unaffected since every shard packs independently. The output is a
    * pure function of (id, tokens, budget, shards) — re-running on a
    * re-partitioned, differently-ordered copy of the corpus yields
    * bit-identical packs, which is what makes training runs reproducible.
    *
    * Output: input columns + `shard` and `pack` (both long; a global pack
    * key is the pair).
    */
  def sequencePack(df: DataFrame, idCol: String, tokensCol: String,
      budgetTokens: Long, shards: Int): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    require(shards > 0, s"shards must be positive: $shards")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", pmod(col(idCol), lit(shards.toLong)))
      .withColumn("__cum_tokens", sum(col(tokensCol)).over(w))
      .withColumn("pack",
        floor((col("__cum_tokens") - col(tokensCol)) /
          lit(budgetTokens.toDouble)).cast("long"))
      .drop("__cum_tokens")
  }

  /** Keep at most `k` rows per group, by rank under `orderCols` — the
    * per-domain / per-language quota cap that keeps one giant domain from
    * dominating a training mix. `orderCols` must be a total order (end it
    * with a unique tiebreak column) or the kept set is nondeterministic.
    *
    * Skew shape: Catalyst already guards the hot-group straggler here —
    * `row_number` + `rk <= k` rewrites to `WindowGroupLimit`, a partial
    * top-k per input partition BEFORE the shuffle, so the per-group sort
    * sees at most partitions*k rows no matter how hot the group
    * (plan-gated in PlanQualitySpec; measured on a 100M-row single group:
    * bare window 2.8s vs salted two-window 11.5s). The bare form is
    * therefore the scale-safe default. `saltPrune = (saltCol, buckets)`
    * remains as an explicit fallback for rank-function/engine combinations
    * where that rewrite doesn't fire: a first window ranks within
    * (group, pmod(saltCol, buckets)) and keeps only k per bucket, bounding
    * the final sort at buckets*k rows per group. The prune is EXACT, not
    * approximate: any row in a group's global top-k is also in the top-k
    * of whichever bucket holds it (fewer than k bucket-mates outrank it),
    * so the bucket survivors are a superset of the answer — proven at
    * scale by ScaleInvariants' salted==unsalted set equality. Output:
    * input columns + `rk` (1-based rank within group).
    */
  def capPerGroup(df: DataFrame, groupCols: Seq[String], orderCols: Seq[Column],
      k: Int, saltPrune: Option[(Column, Int)] = None): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(groupCols.nonEmpty, "capPerGroup needs at least one group column")
    val pruned = saltPrune match {
      case Some((saltCol, buckets)) if buckets > 1 =>
        val wLocal = Window
          .partitionBy(groupCols.map(col) :+ pmod(saltCol, lit(buckets)): _*)
          .orderBy(orderCols: _*)
        df.withColumn("__local_rk", row_number().over(wLocal))
          .where(col("__local_rk") <= k).drop("__local_rk")
      case _ => df
    }
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*)
    pruned.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
  }

  /** Deterministic mixture (re)sampling: materialize a target domain /
    * language mixture from per-group rates. A rate < 1 downsamples the
    * group, a rate > 1 upsamples it (integer full copies plus a
    * deterministically-chosen fractional remainder), rate 0 drops it.
    *
    * Copy count per row: `floor(rate) + (u < frac(rate) ? 1 : 0)` where
    * `u` is THREE iterated Lehmer/MINSTD rounds
    * (`x -> (x * 48271) mod (2^31 - 1)`, seeded `id * 48271 + salt`)
    * scaled to [0, 1). One round is NOT enough: for sequential ids below
    * ~44k the seed never wraps the modulus, u stays near 0, and every row
    * passes any fractional rate; after three modular rounds adjacent ids
    * decorrelate (measured frac(u < 0.25) = 0.244–0.250 on sequential
    * ids). Every step stays under 2^47, so the arithmetic is pure int64 —
    * ANY engine replays the exact kept set from (id, rates, salt), where
    * `rand()` would make the mixture unreproducible and non-resumable.
    * Each emitted copy carries `copy` (1-based) so downstream
    * shuffles/packs treat copies as distinct rows.
    *
    * Scale shape: stateless and narrow — zero shuffles, no state, no
    * skew surface; at 100 TB it is a pure map over the scan with the rate
    * dictionary folded into the plan as a literal CASE (groups are
    * domains/languages — if the mixture spec outgrows a literal, join a
    * broadcast rate table instead). Expected output rows =
    * sum over groups of rate_g * n_g, exact to ±1 per group modulo the
    * Lehmer stream. */
  def mixtureSample(df: DataFrame, idCol: String, groupCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      salt: Long = 11L): DataFrame = {
    require(rates.values.forall(_ >= 0) && defaultRate >= 0,
      "sampling rates must be non-negative")
    requireIntegralId(df, idCol, "mixtureSample")
    // the output column and working temporaries would silently OVERWRITE
    // same-named caller columns (withColumn replaces) — fail loudly instead
    // of corrupting caller data (ADVICE r9)
    Seq("copy", "__rate", "__copies").foreach { c =>
      require(!df.columns.contains(c),
        s"mixtureSample: input already has a '$c' column — rename it; " +
          "'copy' is the operator's output and __rate/__copies are its " +
          "working temporaries")
    }
    val m = 2147483647L // 2^31 - 1
    val rate = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultRate)) { case (acc, (g, r)) =>
        when(col(groupCol) === g, lit(r)).otherwise(acc)
      }.cast("double")
    val x1 = pmod(col(idCol).cast("long") * 48271L + salt, lit(m))
    val x2 = pmod(x1 * 48271L, lit(m))
    val x3 = pmod(x2 * 48271L, lit(m))
    val u = x3.cast("double") / lit(m.toDouble)
    df.withColumn("__rate", rate)
      .withColumn("__copies", floor(col("__rate")).cast("long") +
        when(u < col("__rate") - floor(col("__rate")), 1L).otherwise(0L))
      // guard BEFORE sequence(): Spark's sequence(1, 0) yields the
      // DESCENDING [1, 0], not an empty array
      .where(col("__copies") >= 1L)
      .withColumn("copy", explode(sequence(lit(1L), col("__copies"))))
      .drop("__rate", "__copies")
  }

  /** Leakage-free train/val/test split: the deterministic md5 split
    * ([[TextAnalysis.splitLabel]]) plus an eval-contamination pass — a
    * val/test document that is an exact-shingle-Jaccard near-duplicate
    * (≥ `threshold`) of ANY train document is DEMOTED to train. Held-out
    * metrics are only meaningful if the held-out set has no training
    * twins; demoting (rather than dropping) keeps the data while
    * protecting the eval.
    *
    * Near-dup discovery is the q22-certified shape: one materialized
    * frame carries the MinHash signature AND the verify shingle set
    * (corpus read + hashed once), banding at `bands` over `numHashes`
    * generates candidates at `threshold - estMargin` on the signature
    * estimate, and EXACT shingle Jaccard ≥ `threshold` decides. Verified
    * pairs are exact, but CANDIDATE GENERATION IS PROBABILISTIC
    * (ADVICE r10): banding at the default geometry misses a true pair at
    * the `threshold - estMargin` estimate with probability ~1e-4 (less
    * above it), and buckets past `bucketCap` silently drop members — so
    * the demoted set is a (very high-recall) SUBSET of what brute-force
    * cross-split Jaccard would demote, not a guaranteed equality; a
    * missed demotion is silent eval-set leakage at that ~1e-4 ×
    * overflow rate. The q87 oracle proves equality on its fixture;
    * cap pressure is observable via [[Dedup.lshStats]] after the run
    * (overflowBuckets > 0 ⇒ raise `bucketCap`). Only DIRECT
    * train↔holdout pairs demote; a holdout chain (val₁ ~ val₂ ~ train)
    * demotes val₂ but not val₁ — compose [[Dedup.dupClusters]] over the
    * pair frame first if transitive leakage matters at your threshold.
    *
    * Output: (`idCol`, `split`, `demoted`) — `split` is the final label,
    * `demoted` marks documents moved holdout → train. */
  def leakFreeSplit(df: DataFrame, idCol: String, textCol: String,
      trainPct: Int = 90, valPct: Int = 5, shingleN: Int = 3,
      threshold: Double = 0.5, numHashes: Int = 64, bands: Int = 32,
      estMargin: Double = 0.15, bucketCap: Int = 256): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"bad split percentages: train=$trainPct val=$valPct")
    val frame = Dedup.materialize(df.select(col(idCol).as("id"),
      Dedup.minhashSignature(col(textCol), numHashes, shingleN).as("sig"),
      Dedup.shingles(col(textCol), shingleN).as("sh")))
    val cand = Dedup.minhashDupPairsFromSigs(frame, "id", "sig", bands,
      math.max(0.0, threshold - estMargin), bucketCap)
    val exact = cand
      .join(frame.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(frame.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        graft.functions.TextHashFunctions.set_jaccard(col("sh_a"), col("sh_b"))
          .as("__j"))
      .where(col("__j") >= threshold)
    def lab(c: Column) = TextAnalysis.splitLabel(c, trainPct, valPct)
    val cross = exact.select(col("id_a"), col("id_b"),
      lab(col("id_a")).as("__la"), lab(col("id_b")).as("__lb"))
    val demoted = cross
      .where(col("__la") === "train" && col("__lb") =!= "train")
      .select(col("id_b").as("__did"))
      .union(cross
        .where(col("__lb") === "train" && col("__la") =!= "train")
        .select(col("id_a").as("__did")))
      .distinct()
    df.select(col(idCol), lab(col(idCol)).as("__split0"))
      .join(demoted, col(idCol) === col("__did"), "left")
      .select(col(idCol),
        when(col("__did").isNotNull, "train").otherwise(col("__split0"))
          .as("split"),
        col("__did").isNotNull.as("demoted"))
  }
}
