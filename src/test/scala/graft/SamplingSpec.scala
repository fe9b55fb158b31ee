package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private def corpus = {
    val s = spark
    import s.implicits._
    (0L until 400L).map(i => (i, if (i % 4 == 0) "en" else "de")).toDF("id", "lang")
  }

  test("hashFraction: deterministic, near the target rate, salt-independent draws") {
    val a = Sampling.hashFraction(corpus, "id", 0.25).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashFraction(corpus, "id", 0.25).collect().map(_.getLong(0)).toSet
    assert(a == b) // rerun ⇒ identical sample
    assert(math.abs(a.size - 100) < 40, s"got ${a.size}/400 at fraction 0.25")
    val salted = Sampling.hashFraction(corpus, "id", 0.25, salt = "v2")
      .collect().map(_.getLong(0)).toSet
    assert(salted != a) // a new salt draws an independent sample
    // subset property: raising the fraction only adds rows (hash is fixed)
    val wider = Sampling.hashFraction(corpus, "id", 0.5).collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(wider))
  }

  test("stratifiedFixed: exact quota per stratum, capped by stratum size") {
    val r = Sampling.stratifiedFixed(corpus, Seq("lang"), "id", 30)
      .groupBy("lang").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("en" -> 30L, "de" -> 30L))
    // a stratum smaller than the quota returns whole
    val tiny = Sampling.stratifiedFixed(corpus.filter(col("id") < 8), Seq("lang"), "id", 30)
      .groupBy("lang").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(tiny == Map("en" -> 2L, "de" -> 6L))
  }

  test("splitColumn: every row labeled, stable under corpus growth, ratios sane") {
    val weights = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)
    val labeled = corpus.select(col("id"),
      Sampling.splitColumn(col("id"), weights).as("split")).cache()
    val counts = labeled.groupBy("split").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(counts.values.sum == 400L)
    assert(counts("train") > 250 && counts("train") < 350)
    // a row's split never changes as the corpus grows: labels computed on
    // the first half are a strict sub-map of labels on the whole
    val half = corpus.filter(col("id") < 200).select(col("id"),
      Sampling.splitColumn(col("id"), weights).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = labeled.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(half.forall { case (k, v) => full(k) == v })
    labeled.unpersist()
  }

  test("splitByCluster: clusters never straddle the cut; singletons split by id") {
    val s = spark
    import s.implicits._
    val weights = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)
    // components: {0,1,2} -> comp 0, {10,11} -> comp 10; the rest singleton
    val comps = Seq((0L, 0L), (1L, 0L), (2L, 0L), (10L, 10L), (11L, 10L))
      .toDF("id", "comp")
    val out = Sampling.splitByCluster(corpus, "id", comps, weights)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out.size == 400) // every row labeled exactly once
    // every cluster member carries the canonical member's label
    assert(Set(out(0L), out(1L), out(2L)).size == 1)
    assert(out(10L) == out(11L))
    // singletons are bitwise the plain hash split — append-stability
    // carries over for rows never in a cluster
    val plain = corpus.select(col("id"),
        Sampling.splitColumn(col("id"), weights).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val clustered = Set(0L, 1L, 2L, 10L, 11L)
    assert(out.filterNot(kv => clustered(kv._1)) ==
      plain.filterNot(kv => clustered(kv._1)))
    // the cluster label IS the canonical member's plain label
    assert(out(1L) == plain(0L) && out(11L) == plain(10L))
  }

  test("mixtureSample: per-stratum quotas, clamped to stratum size, unlisted drop") {
    val s = spark
    import s.implicits._
    val df = (0L until 300L)
      .map(i => (i, s"src${i % 3}")).toDF("id", "source") // 100 per source
    val got = Sampling.mixtureSample(df, "source", "id",
        Map("src0" -> 60L, "src1" -> 150L, "src2" -> 0L))
      .collect().map(r => r.getString(1)).groupBy(identity).view.mapValues(_.length)
    assert(got.getOrElse("src0", 0) == 60)
    assert(got.getOrElse("src1", 0) == 100) // quota over size → whole stratum
    assert(got.getOrElse("src2", 0) == 0)
    // determinism + monotonicity: a larger quota only ADDS rows
    def ids(q: Long) = Sampling.mixtureSample(df, "source", "id",
        Map("src0" -> q)).collect().map(_.getLong(0)).toSet
    assert(ids(30).subsetOf(ids(60)))
    assert(ids(30) == ids(30))
  }

  test("temperatureSample: quotas follow sqrt(n), exact arithmetic, clamp and determinism") {
    val s = spark
    import s.implicits._
    // 100 + 400 rows: isqrt 10 + 20 → quotas k·10/30 and k·20/30
    val df = ((0L until 100L).map(i => (i, "small")) ++
      (100L until 500L).map(i => (i, "big"))).toDF("id", "lang")
    val got = Sampling.temperatureSample(df, "lang", "id", k = 90L)
      .collect().map(_.getString(1)).groupBy(identity).view.mapValues(_.length)
    assert(got.getOrElse("small", 0) == 30, s"small quota: $got") // 90*10/30
    assert(got.getOrElse("big", 0) == 60, s"big quota: $got")     // 90*20/30
    // temperature flattens: raw proportions would be 18/72
    // floor allocation: quotas never overshoot k
    val total = Sampling.temperatureSample(df, "lang", "id", k = 7L).count()
    assert(total <= 7)
    // a quota larger than the stratum takes the whole stratum, no more
    val tiny = ((0L until 2L).map(i => (i, "rare")) ++
      (2L until 1000L).map(i => (i, "common"))).toDF("id", "lang")
    val gotTiny = Sampling.temperatureSample(tiny, "lang", "id", k = 5000L)
      .collect().map(_.getString(1)).groupBy(identity).view.mapValues(_.length)
    assert(gotTiny.getOrElse("rare", 0) == 2)
    // deterministic under repartitioning
    val a = Sampling.temperatureSample(df, "lang", "id", 90L)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureSample(df.repartition(13), "lang", "id", 90L)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    // isqrt exactness at the perfect-square boundary: n = 10^12 has
    // isqrt exactly 10^6; n = 10^12 - 1 must floor to 10^6 - 1 (the
    // double sqrt rounds UP across the boundary here — the correction
    // step is what keeps the quota arithmetic exact)
    val sq = ((0L until 9L).map(i => (i, "a")) ++ (9L until 25L).map(i => (i, "b")))
      .toDF("id", "lang") // isqrt 3 + 4 = 7
    val gotSq = Sampling.temperatureSample(sq, "lang", "id", k = 70L)
      .collect().map(_.getString(1)).groupBy(identity).view.mapValues(_.length)
    assert(gotSq.getOrElse("a", 0) == 9)  // quota 30 > |a|=9 → clamp
    assert(gotSq.getOrElse("b", 0) == 16) // quota 40 > |b|=16 → clamp
    // empty corpus → empty sample (not an NPE on the null driver sum)
    assert(Sampling.temperatureSample(df.limit(0), "lang", "id", 5L).count() == 0)
    // NULL strata are excluded from BOTH selection and the quota mass:
    // a huge null stratum must not shrink the real strata's shares
    val withNull = (df.select(col("id"), col("lang")) union
      (1000L until 3000L).map(i => (i, null: String)).toDF("id", "lang"))
    val gotNull = Sampling.temperatureSample(withNull, "lang", "id", k = 90L)
      .collect().map(_.getString(1)).groupBy(identity).view.mapValues(_.length)
    assert(gotNull.getOrElse("small", 0) == 30 &&
      gotNull.getOrElse("big", 0) == 60, s"null stratum leaked: $gotNull")
  }

  test("upsample: whole epochs exact, fractional epochs near-rate, deterministic") {
    val s = spark
    import s.implicits._
    val df = (0L until 600L)
      .map(i => (i, s"src${i % 3}")).toDF("id", "source") // 200 per source
    val up = Sampling.upsample(df, "source", "id",
      Map("src0" -> 2.0, "src1" -> 0.5, "src2" -> 1.25))
    val bySrc = up.collect().map(r => (r.getString(1), r.getLong(0), r.getAs[Long]("epoch")))
    val counts = bySrc.groupBy(_._1).view.mapValues(_.length).toMap
    assert(counts("src0") == 400)                      // exactly 2 epochs
    assert(counts("src1") > 60 && counts("src1") < 140) // ~0.5 epoch
    assert(counts("src2") > 210 && counts("src2") < 290) // ~1.25 epochs
    // every src2 row keeps its base copy; only the fractional copy varies
    assert(bySrc.filter(_._1 == "src2").count(_._3 == 0L) == 200)
    // copy indices are dense 0..copies-1 per row
    val perRow = bySrc.groupBy(t => (t._1, t._2)).values
    assert(perRow.forall(c => c.map(_._3).sorted.toSeq == (0L until c.length).toSeq))
    // deterministic re-materialization
    val again = Sampling.upsample(df, "source", "id",
      Map("src0" -> 2.0, "src1" -> 0.5, "src2" -> 1.25))
      .collect().map(r => (r.getString(1), r.getLong(0), r.getAs[Long]("epoch"))).toSet
    assert(again == bySrc.toSet)
    // unlisted strata drop
    assert(Sampling.upsample(df, "source", "id", Map("src0" -> 1.0))
      .select("source").distinct().collect().map(_.getString(0)).toSeq == Seq("src0"))
  }

  test("splitColumn rejects empty or non-positive weights") {
    intercept[IllegalArgumentException] {
      Sampling.splitColumn(col("id"), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Sampling.splitColumn(col("id"), Seq("a" -> 0.5, "b" -> -0.1))
    }
  }

  test("weightedSample: weight-proportional selection, deterministic under partitioning") {
    val s = spark
    import s.implicits._
    // 10% of rows carry 100x the weight of the rest
    val df = (0L until 1000L)
      .map(i => (i, if (i < 100) 100.0 else 1.0)).toDF("id", "w")
    val picked = Sampling.weightedSample(df, "id", "w", k = 100)
      .select("id").collect().map(_.getLong(0)).toSet
    val heavy = picked.count(_ < 100L)
    assert(heavy > 60,
      s"expected heavy rows to dominate a weighted sample, got $heavy/100")
    val repicked = Sampling.weightedSample(df.repartition(13), "id", "w", k = 100)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(picked == repicked, "weighted sample depends on partitioning")
    // a different salt draws a different (still weight-biased) sample
    val other = Sampling.weightedSample(df, "id", "w", k = 100, salt = "x")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(other != picked)
  }

  test("weightedSample: null and non-positive weights are excluded, never dominant") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Some(-5.0)), (2L, None), (3L, Some(0.0)), (4L, Some(1.0)),
      (5L, Some(2.0))).toDF("id", "w")
    val picked = Sampling.weightedSample(df, "id", "w", k = 3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(picked == Set(4L, 5L),
      s"only positive-weight rows are sampleable, got $picked")
  }

  test("weightedSampleGrouped: per-stratum A-ES, grouped ≡ per-group global, partial group limit") {
    val s = spark
    import s.implicits._
    val df = (0L until 400L)
      .map(i => (i, s"d${i % 4}", 1.0 + (i % 17))).toDF("id", "dom", "w")
    val grouped = Sampling.weightedSampleGrouped(df, "dom", "id", "w", k = 10)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    // grouped result = union of per-stratum global weightedSample calls
    val perGroup = (0 until 4).flatMap { d =>
      Sampling.weightedSample(df.filter(col("dom") === s"d$d"), "id", "w", 10)
        .collect().map(r => (s"d$d", r.getLong(0)))
    }.toSet
    assert(grouped == perGroup)
    assert(grouped.groupBy(_._1).forall(_._2.size == 10))
    // excluded weights never selected, short strata never padded
    val mixed = ((0L until 5L).map(i => (i, "a", 2.0)) ++
      (5L until 10L).map(i => (i, "a", -1.0)) ++
      (10L until 12L).map(i => (i, "b", 1.0))).toDF("id", "dom", "w")
    val got = Sampling.weightedSampleGrouped(mixed, "dom", "id", "w", 4)
      .collect().map(r => (r.getString(1), r.getLong(0)))
    assert(got.count(_._1 == "a") == 4 && got.filter(_._1 == "a").forall(_._2 < 5))
    assert(got.count(_._1 == "b") == 2)
    // the rank filter compiles to a partial WindowGroupLimit (the
    // shuffle carries at most k rows per stratum per map task)
    val plan = Sampling.weightedSampleGrouped(df, "dom", "id", "w", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      s"expected partial WindowGroupLimit:\n$plan")
  }

  test("epochShuffle: a reproducible permutation, independent across epochs") {
    val s = spark
    import s.implicits._
    val df = (1L to 500L).toDF("id")
    def order(epoch: Int, parts: Int) =
      Sampling.epochShuffle(df.repartition(parts), "id", epoch)
        .collect().sortBy(_.getString(1)).map(_.getLong(0)).toSeq
    val e1 = order(1, 4)
    // permutation: every row exactly once
    assert(e1.sorted == (1L to 500L), "shuffle lost or duplicated rows")
    // reproducible and partitioning-invariant
    assert(e1 == order(1, 13), "epoch order depends on input partitioning")
    // epochs draw different permutations
    val e2 = order(2, 4)
    assert(e1 != e2, "different epochs must reorder differently")
    // the emitted partition/sort order equals key order (the contract:
    // writing rows as laid out realizes the permutation)
    val laidOut = Sampling.epochShuffle(df.repartition(4), "id", 1)
      .collect().map(_.getLong(0)).toSeq
    // toLocalIterator/collect preserves partition order; within/across
    // partitions rows must already be key-ascending
    val keys = Sampling.epochShuffle(df.repartition(4), "id", 1)
      .collect().map(_.getString(1)).toSeq
    assert(keys == keys.sorted, "rows are not globally key-ordered as laid out")
    assert(laidOut == e1, "laid-out row order diverges from key order")
  }
}
