package graft.text

import breeze.linalg.DenseVector
import breeze.optimize.{DiffFunction, LBFGS}

/** Driver-local logistic-regression fits for the BOUNDED labeled
  * frames the learned text filters train on (r20, guide §1.2/§5).
  *
  * WHY THIS EXISTS: MLlib's LogisticRegression launches one
  * treeAggregate JOB per L-BFGS step — 50-60 sequential Spark jobs
  * for a labeled frame of a few hundred rows, each paying full
  * job-scheduling overhead to aggregate a gradient the driver could
  * compute in microseconds (measured: q172's 360-row fit was ~3.1 s
  * of its 3.5 s wall; the local fit is < 50 ms). This is the
  * [[graft.dedup.TextDedup.dedupClusters]] adaptive stance applied to
  * training: labeled data is the expensive, bounded resource
  * (FineWeb-Edu trains on ~500k rows; CCNet on Wikipedia samples), so
  * when the featurized frame fits comfortably on the driver we
  * collect it once and run the SAME zero-init L-BFGS optimization
  * in-process; past the bound the caller falls back to MLlib's
  * distributed fit unchanged.
  *
  * Determinism (the spec contract both callers pin): zero init, no
  * RNG, gradient accumulated in the collected row order — a refit on
  * the same frame at the same parallelism reproduces bit-identically.
  *
  * Objective (both fits): mean cross-entropy + 0.5·regParam·‖W‖²,
  * intercepts unregularized — the standard ridge-logit shape. The
  * optimum differs from MLlib's standardized-feature objective in
  * low-order digits of the weights; both callers' gates are
  * BEHAVIORAL (held-out accuracy/AUC ≥ 0.95, refit determinism,
  * prior-on-empty), which this satisfies identically.
  */
private[text] object LogitFit {

  /** Rows a fit consumes: label index (binomial: 0/1) plus the row's
    * sparse feature counts as parallel (bucket, count) arrays. */
  final case class Row(label: Int, idx: Array[Int], cnt: Array[Double])

  /** Default driver bound: 65536 rows ≈ tens of MB of sparse counts
    * at a few hundred tokens per document — comfortable next to the
    * union-find's documented 4M-edge collect. Above it, callers use
    * MLlib's distributed fit. */
  val MaxDriverRows = 65536L

  /** Multinomial softmax regression, zero init, L-BFGS(m=10, tol 1e-6).
    * → (weights k×dim, intercepts k). */
  def fitMultinomial(
      rows: Array[Row], k: Int, dim: Int,
      regParam: Double, maxIter: Int): (Array[Array[Double]], Array[Double]) = {
    require(k >= 2, s"need >= 2 classes, got $k")
    val n = rows.length
    require(n > 0, "empty training frame")
    val size = k * dim + k // weights row-major, then intercepts
    val f = new DiffFunction[DenseVector[Double]] {
      def calculate(theta: DenseVector[Double]): (Double, DenseVector[Double]) = {
        val t = theta.data
        val g = new Array[Double](size)
        var loss = 0.0
        val m = new Array[Double](k)
        var r = 0
        while (r < n) {
          val row = rows(r)
          val nnz = row.idx.length
          var c = 0
          while (c < k) {
            var s = t(k * dim + c)
            val base = c * dim
            var j = 0
            while (j < nnz) { s += t(base + row.idx(j)) * row.cnt(j); j += 1 }
            m(c) = s
            c += 1
          }
          var mx = m(0); c = 1
          while (c < k) { if (m(c) > mx) mx = m(c); c += 1 }
          var z = 0.0; c = 0
          while (c < k) { z += math.exp(m(c) - mx); c += 1 }
          val lse = mx + math.log(z)
          loss += lse - m(row.label)
          c = 0
          while (c < k) {
            val p = math.exp(m(c) - lse)
            val coef = if (c == row.label) p - 1.0 else p
            g(k * dim + c) += coef
            val base = c * dim
            var j = 0
            while (j < nnz) { g(base + row.idx(j)) += coef * row.cnt(j); j += 1 }
            c += 1
          }
          r += 1
        }
        val inv = 1.0 / n
        var i = 0
        while (i < size) { g(i) *= inv; i += 1 }
        var reg = 0.0
        i = 0
        while (i < k * dim) { // intercepts unregularized
          reg += t(i) * t(i); g(i) += regParam * t(i); i += 1
        }
        (loss * inv + 0.5 * regParam * reg, DenseVector(g))
      }
    }
    val opt = new LBFGS[DenseVector[Double]](maxIter = maxIter, m = 10, tolerance = 1e-6)
    val sol = opt.minimize(f, DenseVector.zeros[Double](size)).data
    (Array.tabulate(k)(c => java.util.Arrays.copyOfRange(sol, c * dim, c * dim + dim)),
      Array.tabulate(k)(c => sol(k * dim + c)))
  }

  /** Binomial logistic regression (labels 0/1), zero init, same
    * optimizer settings. → (weights dim, intercept). */
  def fitBinomial(
      rows: Array[Row], dim: Int,
      regParam: Double, maxIter: Int): (Array[Double], Double) = {
    val n = rows.length
    require(n > 0, "empty training frame")
    val size = dim + 1
    val f = new DiffFunction[DenseVector[Double]] {
      def calculate(theta: DenseVector[Double]): (Double, DenseVector[Double]) = {
        val t = theta.data
        val g = new Array[Double](size)
        var loss = 0.0
        var r = 0
        while (r < n) {
          val row = rows(r)
          val nnz = row.idx.length
          var s = t(dim)
          var j = 0
          while (j < nnz) { s += t(row.idx(j)) * row.cnt(j); j += 1 }
          val y = row.label.toDouble
          // log(1 + e^s) − y·s, computed overflow-safe for |s| large
          loss += math.max(s, 0.0) + math.log1p(math.exp(-math.abs(s))) - y * s
          val p = 1.0 / (1.0 + math.exp(-s))
          val coef = p - y
          g(dim) += coef
          j = 0
          while (j < nnz) { g(row.idx(j)) += coef * row.cnt(j); j += 1 }
          r += 1
        }
        val inv = 1.0 / n
        var i = 0
        while (i < size) { g(i) *= inv; i += 1 }
        var reg = 0.0
        i = 0
        while (i < dim) { reg += t(i) * t(i); g(i) += regParam * t(i); i += 1 }
        (loss * inv + 0.5 * regParam * reg, DenseVector(g))
      }
    }
    val opt = new LBFGS[DenseVector[Double]](maxIter = maxIter, m = 10, tolerance = 1e-6)
    val sol = opt.minimize(f, DenseVector.zeros[Double](size)).data
    (java.util.Arrays.copyOfRange(sol, 0, dim), sol(dim))
  }

  /** Collapse a row's hashed indices to sorted (bucket, count) pairs —
    * the same count semantics both trainers' featurizers use. */
  def toRow(label: Int, hashed: Seq[Int]): Row = {
    val grouped = hashed.groupBy(identity).toArray.sortBy(_._1)
    Row(label, grouped.map(_._1), grouped.map(_._2.size.toDouble))
  }
}
