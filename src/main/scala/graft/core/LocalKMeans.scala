package graft.core

/** Seeded, deterministic Lloyd's k-means over a driver-side sample.
  *
  * Codebook/centroid training at 100 TB scale is done on a bounded
  * sample (the standard IVF/PQ practice — a few hundred thousand rows
  * bound the centroid error regardless of corpus size); assignment then
  * runs distributed via the codegen'd NearestCentroid expression. This
  * mirrors the reference's `scipy.kmeans2(..., minit='points')`
  * (ivf.py:75, pq.py:11): init = k distinct sampled points, Lloyd
  * iterations, empty clusters re-seeded.
  */
object LocalKMeans {

  /** @return k×dim centroids (deterministic for fixed inputs/seed).
    * `threads` picks the intra-fit pool size: the default 16 suits a
    * driver-side fit; EXECUTOR-side per-group fits (the hierarchical
    * IVF child level, where many fits already run concurrently across
    * tasks) should pass 1 to avoid pool-per-task oversubscription.
    * Results are thread-count-INDEPENDENT in structure but the partial
    * -sum merge order is fixed per thread count, so determinism holds
    * for a given (points, k, seed, threads). */
  def fit(points: Array[Array[Float]], k: Int, maxIter: Int = 100,
          seed: Long = 42L, threads: Int = 16): Array[Array[Float]] = {
    require(points.nonEmpty, "Cannot build index from empty node list")
    require(points.length >= k,
      s"Need at least $k nodes to build index with $k clusters")
    require(threads >= 1, s"threads must be >= 1, got $threads")
    val dim = points.head.length
    val rng = new scala.util.Random(seed)
    // minit='points': k distinct sample indices
    val init = rng.shuffle(points.indices.toVector).take(k)
    var centroids = init.map(i => points(i).map(_.toDouble)).toArray

    val assign = new Array[Int](points.length)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      var iter = 0
      var changed = true
      while (iter < maxIter && changed) {
        val cents = centroids
        val ranges = (0 until threads).map { t =>
          val lo = (points.length.toLong * t / threads).toInt
          val hi = (points.length.toLong * (t + 1) / threads).toInt
          (lo, hi)
        }
        val tasks = ranges.map { case (lo, hi) =>
          pool.submit(new java.util.concurrent.Callable[(Boolean, Array[Array[Double]], Array[Int])] {
            def call() = {
              var localChanged = false
              val sums = Array.fill(k)(new Array[Double](dim))
              val counts = new Array[Int](k)
              var p = lo
              while (p < hi) {
                val pt = points(p)
                var best = 0
                var bestD = Double.MaxValue
                var j = 0
                while (j < k) {
                  var s = 0.0
                  val c = cents(j)
                  var i = 0
                  while (i < dim) { val d = pt(i) - c(i); s += d * d; i += 1 }
                  if (s < bestD) { bestD = s; best = j }
                  j += 1
                }
                if (assign(p) != best) { assign(p) = best; localChanged = true }
                counts(best) += 1
                var i2 = 0
                while (i2 < dim) { sums(best)(i2) += pt(i2); i2 += 1 }
                p += 1
              }
              (localChanged, sums, counts)
            }
          })
        }
        val results = tasks.map(_.get())
        changed = results.exists(_._1)
        val sums = Array.fill(k)(new Array[Double](dim))
        val counts = new Array[Int](k)
        results.foreach { case (_, ls, lc) => // fixed order merge
          var j = 0
          while (j < k) {
            counts(j) += lc(j)
            var i = 0
            while (i < dim) { sums(j)(i) += ls(j)(i); i += 1 }
            j += 1
          }
        }
        centroids = Array.tabulate(k) { j =>
          if (counts(j) == 0) points(rng.nextInt(points.length)).map(_.toDouble) // re-seed empty
          else sums(j).map(_ / counts(j))
        }
        iter += 1
      }
    } finally pool.shutdown()
    centroids.map(_.map(_.toFloat))
  }
}
