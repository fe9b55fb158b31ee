package graft.core

/** Engine configuration knobs (E5) — defaults mirror the reference's
  * `src/config.yaml:1-12` where a setting has a reference analog.
  * Construct from a Map (e.g. parsed Typesafe/SparkConf entries); no
  * YAML dependency in the zero-egress build. */
case class GraftConfig(
    dim: Int = 384,              // embedding_dim (config.yaml:3)
    m: Int = 16,                 // HNSW M (config.yaml:6)
    efConstruction: Int = 200,   // (config.yaml:7)
    ef: Int = 50,                // search beam default (models.py:19)
    topK: Int = 5,               // API default (models.py:16)
    nProbe: Int = 10,            // IVF probe default (models.py:20)
    flushThreshold: Long = 1000, // persistence batching (config.yaml:8)
    capacity: Long = 1000000,    // store capacity (config.yaml:12); soft in Spark
    kmeansMaxIter: Int = 100,    // ivf.py:75, pq.py:11
    seed: Long = 42,             // indexing_service.py:57
    // scale-aware default knobs (engine extension — each anchor is a
    // MEASURED recall row, see the Ivf/Bq/Pq scaladocs): the fraction
    // of IVF lists the auto probe covers, and the √N multipliers the
    // auto BQ/PQ rerank windows use
    ivfProbeFraction: Double = graft.operators.Ivf.ScaledProbeFraction,
    bqRerankFactor: Double = graft.operators.Bq.RerankScaleFactor,
    pqRerankFactor: Double = graft.operators.Pq.RerankScaleFactor,
    // metadata-filtered HNSW routing: at or above this match fraction a
    // filtered search serves from the persisted graph with over-fetch +
    // post-filter instead of the per-query pre-filter rebuild (the
    // rebuild measured ~12× the persisted serve at 10M; recall in the
    // loose regime re-gated in VectorStoreSpec)
    hnswPostFilterMinFraction: Double = 0.5)

object GraftConfig {
  val default: GraftConfig = GraftConfig()

  /** Parse from string key-values (spark conf / properties style). */
  def from(settings: Map[String, String]): GraftConfig = {
    val d = default
    def i(k: String, v: Int) = settings.get(k).map(_.toInt).getOrElse(v)
    def l(k: String, v: Long) = settings.get(k).map(_.toLong).getOrElse(v)
    def dd(k: String, v: Double) = settings.get(k).map(_.toDouble).getOrElse(v)
    GraftConfig(
      dim = i("graft.dim", d.dim),
      m = i("graft.hnsw.m", d.m),
      efConstruction = i("graft.hnsw.efConstruction", d.efConstruction),
      ef = i("graft.hnsw.ef", d.ef),
      topK = i("graft.search.topK", d.topK),
      nProbe = i("graft.ivf.nProbe", d.nProbe),
      flushThreshold = l("graft.flushThreshold", d.flushThreshold),
      capacity = l("graft.capacity", d.capacity),
      kmeansMaxIter = i("graft.kmeans.maxIter", d.kmeansMaxIter),
      seed = l("graft.seed", d.seed),
      ivfProbeFraction = dd("graft.ivf.probeFraction", d.ivfProbeFraction),
      bqRerankFactor = dd("graft.bq.rerankFactor", d.bqRerankFactor),
      pqRerankFactor = dd("graft.pq.rerankFactor", d.pqRerankFactor),
      hnswPostFilterMinFraction =
        dd("graft.hnsw.postFilterMinFraction", d.hnswPostFilterMinFraction))
  }
}
