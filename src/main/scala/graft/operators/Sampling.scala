package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines. All
  * randomness is hash-derived (md5 of the id + salt), so results are
  * reproducible run-to-run, engine-independent (exact DuckDB twins —
  * unlike `rand(seed)`, whose stream is engine-private), stable under
  * repartitioning, and consistent for a given row across incremental
  * runs — the properties corpus curation needs from a sampler.
  *
  * Scale design: hash-based filters are per-row scans (no shuffle);
  * the fixed-size stratified sample is one window per stratum with a
  * rank predicate Spark rewrites to a partial WindowGroupLimit (top-n
  * retained map-side before the shuffle — the q_window_rank shape).
  */
object Sampling {

  /** Uniform-in-[0,1) hash of `id` (+ salt): first 8 md5 hex chars as
    * an unsigned 32-bit int over 2^32. Changing the salt draws an
    * independent sample. */
  def hashUniform(id: Column, salt: String = ""): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Bernoulli-by-hash sample: keeps each row independently with
    * probability `fraction`, deterministically in the row id. */
  def hashFraction(df: DataFrame, idCol: String, fraction: Double,
                   salt: String = ""): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1], got $fraction")
    df.filter(hashUniform(col(idCol), salt) < fraction)
  }

  /** Fixed-size per-stratum sample: the `n` rows with the smallest hash
    * in each stratum (id tie-break for md5 collisions). Exactly n per
    * stratum when the stratum has ≥ n rows — the quota-sampling contract
    * `hashFraction` can't give. */
  def stratifiedFixed(df: DataFrame, strata: Seq[String], idCol: String,
                      n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(hashUniform(col(idCol)).asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n).drop("__rn")
  }

  /** Mixture construction — the domain-mixing step of corpus assembly
    * ("60% web, 30% code, 10% books" → per-source quotas): stratum s
    * keeps its min(quotas(s), |s|) smallest-hash rows; strata absent
    * from `quotas` are dropped (quota 0). Deterministic in the row id,
    * like every sampler here, so a mixture is reproducible and can be
    * re-materialized incrementally. One window shuffle on the stratum
    * key (WindowGroupLimit applies the per-stratum top-N partially,
    * before the exchange — the same plan contract as
    * [[stratifiedFixed]]). */
  def mixtureSample(df: DataFrame, stratumCol: String, idCol: String,
                    quotas: Map[String, Long]): DataFrame = {
    require(quotas.nonEmpty, "quotas must be non-empty")
    require(quotas.values.forall(_ >= 0), s"quotas must be >= 0, got $quotas")
    val quota = quotas.foldLeft(lit(0L)) { case (acc, (s, q)) =>
      when(col(stratumCol) === s, lit(q)).otherwise(acc)
    }
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashUniform(col(idCol)).asc, col(idCol).asc)
    // literal max-quota filter first: that's the form the optimizer
    // turns into a partial WindowGroupLimit below the exchange; the
    // per-stratum quota column then refines it exactly
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= lit(quotas.values.max))
      .filter(col("__rn") <= quota)
      .drop("__rn")
  }

  /** Exact integer floor-sqrt: IEEE double sqrt is correctly rounded,
    * so the true ⌊√n⌋ is within one of the cast — two correction steps
    * make it exact for any non-negative BIGINT, in Spark and DuckDB
    * alike (both use the hardware sqrt). */
  private def isqrt(n: Column): Column = {
    val s0 = floor(sqrt(n.cast("double"))).cast("long")
    val up = when((s0 + 1) * (s0 + 1) <= n, s0 + 1).otherwise(s0)
    when(up * up > n, up - 1).otherwise(up)
  }

  /** Temperature-balanced mixture: per-stratum quotas proportional to
    * n_s^α at α = 0.5 — the "sample p_s ∝ n_s^α" recipe multilingual
    * corpora use to keep head languages from drowning the tail
    * (mBERT/XLM exponent-smoothed sampling; most recipes land near
    * α ∈ [0.5, 0.7]). quota_s = ⌊k·√n_s / Σ_t √n_t⌋, computed entirely
    * in exact integer arithmetic ([[isqrt]] + BIGINT multiply +
    * integral divide), so the selected set replays bit-exactly in the
    * oracle; floor allocation may leave < |strata| of the k slots
    * unfilled (documented contract — largest-remainder top-up would
    * need a fold-order-dependent tie-break for no practical gain).
    * Selection within a stratum is smallest-hash-first, the same
    * deterministic rank every sampler here uses. Other α: compute
    * quotas upstream and call [[mixtureSample]]. NULL-stratum rows are
    * excluded entirely — never selected AND never counted into the
    * quota mass.
    *
    * Scale: one map-side-combined count per stratum, one |strata|-row
    * broadcast join, one window shuffle on the stratum key with the
    * partial WindowGroupLimit cap at k (rank work bounded map-side).
    * Only a single long (Σ√n) reaches the driver. */
  def temperatureSample(df: DataFrame, stratumCol: String, idCol: String,
                        k: Long): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // null-stratum rows are excluded OUTRIGHT: the equi-join below can
    // never select them, so counting them into the quota mass would
    // silently shrink every real stratum's share of k
    val base = df.filter(col(stratumCol).isNotNull)
    val counts = base.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__sq", isqrt(col("__n")))
    val totalRow = counts.agg(sum(col("__sq"))).head
    if (totalRow.isNullAt(0)) return df.limit(0) // empty corpus: empty sample
    val total = totalRow.getLong(0)
    import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}
    val quota = column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      expression(col("__sq") * lit(k)), expression(lit(total))))
    val quotas = counts.select(col(stratumCol).as("__stratum"),
      quota.as("__quota"))
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashUniform(col(idCol)).asc, col(idCol).asc)
    base.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= lit(k))
      .join(broadcast(quotas), col(stratumCol) === col("__stratum"))
      .filter(col("__rn") <= col("__quota"))
      .drop("__rn", "__stratum", "__quota")
  }

  /** Epoch-based upsampling — the other half of mixture construction
    * ("2.25 epochs of web, 0.5 of books"): every row of stratum s
    * appears ⌊e_s⌋ times, plus once more iff its salted hash-uniform
    * falls under frac(e_s) — deterministic in the row id, so the
    * mixed corpus re-materializes identically. Output adds `epoch`
    * (0-based copy index, so downstream shuffles/packing can
    * distinguish copies). Strata absent from `epochs` drop (0 epochs).
    *
    * Scale: pure per-row sequence-explode — no shuffle; the fan-out is
    * exactly the requested epoch factor. */
  def upsample(df: DataFrame, stratumCol: String, idCol: String,
               epochs: Map[String, Double], salt: String = "up"): DataFrame = {
    require(epochs.nonEmpty, "epochs must be non-empty")
    require(epochs.values.forall(e => e >= 0 && !e.isInfinite && !e.isNaN),
      s"epoch factors must be finite and >= 0, got $epochs")
    val whole = epochs.foldLeft(lit(0L)) { case (acc, (s, e)) =>
      when(col(stratumCol) === s, lit(math.floor(e).toLong)).otherwise(acc)
    }
    val fracP = epochs.foldLeft(lit(0.0)) { case (acc, (s, e)) =>
      when(col(stratumCol) === s, lit(e - math.floor(e))).otherwise(acc)
    }
    df.withColumn("__copies",
        whole + when(hashUniform(col(idCol), salt) < fracP, lit(1L))
          .otherwise(lit(0L)))
      .filter(col("__copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies")
  }

  /** Weighted sample without replacement (Efraimidis–Spirakis A-ES):
    * row priority key = −ln(u)/w with u the row's hash uniform — the k
    * SMALLEST keys are a weight-proportional sample. ln goes through
    * the libm-exact kernel ([[graft.expressions.FloatKernels.ln]]) so
    * keys — and therefore the selected set — are bit-identical to the
    * DuckDB oracle (pow-based u^(1/w) would not be: pow is not
    * correctly rounded and differs across libms).
    *
    * Deterministic in (id, salt) like every sampler here. Rows with
    * null or non-positive weight are EXCLUDED before keying — a null
    * weight would sort first (Spark ascending = NULLS FIRST) and a
    * negative weight would produce a negative key, either silently
    * crowding out the whole sample. SIZE CONTRACT: the result has
    * min(k, #rows-with-positive-weight) rows — zero-weight rows never
    * pad a short sample (weight 0 means selection probability 0).
    * Scale: per-row key + `TakeOrderedAndProject` — no shuffle of the
    * table, same shape as exact kNN. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val key = negate(graft.expressions.FloatKernels.ln(
      hashUniform(col(idCol), salt))) / col(weightCol).cast("double")
    // !isnan matters: NaN > 0 is TRUE under Spark SQL's NaN ordering,
    // so NaN-weight rows would otherwise pass and pad the sample
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0 &&
        !isnan(col(weightCol).cast("double")))
      .withColumn("es_key", key)
      .orderBy(col("es_key").asc, col(idCol).asc)
      .limit(k)
  }

  /** Per-stratum weighted sample without replacement — [[weightedSample]]
    * with the A-ES priority key ranked INSIDE each stratum (domain,
    * language): the k smallest keys per stratum are that stratum's
    * weight-proportional sample. Same exclusion contract (null/
    * non-positive/NaN weights never selected) and size contract
    * (min(k, stratum positive-weight rows) per stratum). Scale: one
    * window shuffle on the stratum key; the literal-k rank filter is
    * the WindowGroupLimit form, so each map task keeps at most k rows
    * per stratum before the exchange — the shuffle never carries the
    * corpus. */
  def weightedSampleGrouped(df: DataFrame, stratumCol: String, idCol: String,
                            weightCol: String, k: Int,
                            salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val key = negate(graft.expressions.FloatKernels.ln(
      hashUniform(col(idCol), salt))) / col(weightCol).cast("double")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("es_key").asc, col(idCol).asc)
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0 &&
        !isnan(col(weightCol).cast("double")))
      .withColumn("es_key", key)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= lit(k))
      .drop("__rn")
  }

  /** Deterministic dataset split (train/val/test …): labels each row by
    * where its hash uniform falls among the cumulative `weights`
    * (normalized; last split absorbs the remainder, so every row gets a
    * label). A row's split never changes as the corpus grows — append-
    * only pipelines can split incrementally without leakage. */
  def splitColumn(id: Column, weights: Seq[(String, Double)],
                  salt: String = ""): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"weights must be non-empty and positive, got $weights")
    val total = weights.map(_._2).sum
    val u = hashUniform(id, salt)
    val cuts = weights.map(_._2).scanLeft(0.0)(_ + _).tail.map(_ / total)
    weights.init.zip(cuts.init).foldRight(lit(weights.last._1): Column) {
      case (((name, _), cut), rest) => when(u < cut, lit(name)).otherwise(rest)
    }
  }

  /** Leakage-safe split: every near-dup CLUSTER lands wholly on one
    * side of the train/val/test cut. Splitting by row id leaks — two
    * near-identical documents hash independently, one trains while its
    * twin tests, and the eval overstates generalization. Here the split
    * key is the cluster's canonical (min-id) member from a
    * connected-components pass over the near-dup pair graph
    * (`Dedup.connectedComponents` output: (id, comp)); unclustered
    * documents fall back to their own id, which [[splitColumn]]'s
    * append-stability carries over unchanged: rows never in a cluster
    * split exactly as a plain hash split would.
    *
    * Scale: one id-equi left join against the components table — only
    * documents that appear in a near-dup pair are in it, a small
    * fraction of the corpus on curated data (AQE broadcasts it when it
    * fits); the label itself is pure per-row hash arithmetic, no
    * shuffle of the corpus. Deterministic in (cluster key, salt) — the
    * same contract every sampler here has. */
  def splitByCluster(df: DataFrame, idCol: String, components: DataFrame,
                     weights: Seq[(String, Double)],
                     salt: String = ""): DataFrame = {
    val comp = components.select(col("id").as("__cc_id"),
      col("comp").as("__cc_comp"))
    df.join(comp, col(idCol) === col("__cc_id"), "left")
      .withColumn("split",
        splitColumn(coalesce(col("__cc_comp"), col(idCol)), weights, salt))
      .drop("__cc_id", "__cc_comp")
  }

  /** Deterministic per-epoch corpus shuffle: every epoch visits the
    * corpus in a fresh pseudorandom order, reproducibly. The order IS
    * the md5 key `shuffle_key` = md5(epoch | id) — writing the rows
    * sorted by it realizes the permutation (e.g.
    * `.write.sortBy`/ordered file emission); a different epoch draws an
    * independent permutation; re-runs are identical.
    *
    * Scale: `repartitionByRange` + `sortWithinPartitions` is a
    * distributed total order (range exchange + local sorts) — never a
    * single-reducer global window. No global row index is materialized
    * on purpose: a training reader consumes files in key order, and a
    * contiguous global position would cost a second prefix-sum pass
    * (see `Chunker.packOffsets` for that shape when offsets ARE
    * needed). */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int): DataFrame =
    df.withColumn("shuffle_key",
        md5(concat_ws("|", lit(epoch), col(idCol).cast("string"))))
      .repartitionByRange(col("shuffle_key"))
      .sortWithinPartitions("shuffle_key")
}
