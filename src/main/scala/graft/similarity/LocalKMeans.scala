package graft.similarity

/** Driver-local k-means for the BOUNDED corpora [[Ann.ivfIndex]]
  * quantizes (r20, guide §1.2/§5 — the [[graft.text.LogitFit]]
  * stance): seeded deterministic k-means++ init + Lloyd sweeps,
  * MLlib's default stopping rule (maxIter 20, centroid movement below
  * tol 1e-4). Replaces ~25 sequential Spark jobs (kmeans|| init
  * passes + one treeAggregate per Lloyd round) with an in-process fit
  * when the vectors fit comfortably on the driver; [[Ann.ivfIndex]]
  * keeps MLlib's distributed fit past the bound.
  *
  * The fitted centers are NOT numerically identical to MLlib's (init
  * differs; cell identity is arbitrary in any k-means) — the IVF
  * contract is assignment QUALITY, pinned behaviorally by
  * SimilaritySpec's planted-cluster and recall gates, and exactness
  * OF assignment given centers, which both paths delegate to the same
  * [[Ann.ivfAssign]] argmin. Determinism: the seed fixes the init
  * draws, ties break to the lowest index, and sweeps are sequential
  * over the collected row order — refits on the same frame reproduce
  * bit-identically.
  */
private[similarity] object LocalKMeans {

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }

  /** Fit min(k, #distinct points) centroids. `points` must be
    * non-empty, rows of equal length. → centers (k' × dim). */
  def fit(points: Array[Array[Double]], k: Int, seed: Long,
      maxIter: Int = 20, tol: Double = 1e-4): Array[Array[Double]] = {
    require(points.nonEmpty, "LocalKMeans.fit needs at least one point")
    require(k >= 1, s"k must be positive, got $k")
    val n = points.length
    val dim = points(0).length
    val rnd = new java.util.Random(seed)
    // --- k-means++ init: first center uniform, then D²-weighted ---
    val centers = new scala.collection.mutable.ArrayBuffer[Array[Double]]
    centers += points(rnd.nextInt(n)).clone()
    val d2 = Array.tabulate(n)(i => sqDist(points(i), centers(0)))
    while (centers.length < math.min(k, n)) {
      val total = d2.sum
      if (total <= 0) {
        // every remaining point coincides with a center — stop early
        // (fewer than k distinct points)
        return centers.toArray
      }
      var r = rnd.nextDouble() * total
      var pick = 0
      while (pick < n - 1 && r > d2(pick)) { r -= d2(pick); pick += 1 }
      val c = points(pick).clone()
      centers += c
      var i = 0
      while (i < n) {
        val d = sqDist(points(i), c)
        if (d < d2(i)) d2(i) = d
        i += 1
      }
    }
    // --- Lloyd sweeps: assign (ties → lowest cell), recompute means ---
    val kk = centers.length
    val assign = new Array[Int](n)
    var iter = 0
    var moved = Double.MaxValue
    while (iter < maxIter && moved > tol * tol) {
      var i = 0
      while (i < n) {
        var best = 0
        var bestD = sqDist(points(i), centers(0))
        var c = 1
        while (c < kk) {
          val d = sqDist(points(i), centers(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      i = 0
      while (i < n) {
        val s = sums(assign(i)); val p = points(i)
        var j = 0
        while (j < dim) { s(j) += p(j); j += 1 }
        counts(assign(i)) += 1
        i += 1
      }
      moved = 0.0
      var c = 0
      while (c < kk) {
        if (counts(c) > 0) { // empty cells keep their center (MLlib rule)
          val s = sums(c)
          var j = 0
          while (j < dim) { s(j) /= counts(c); j += 1 }
          val m = sqDist(centers(c), s)
          if (m > moved) moved = m
          centers(c) = s
        }
        c += 1
      }
      iter += 1
    }
    centers.toArray
  }
}
