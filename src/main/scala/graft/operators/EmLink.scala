package graft.operators

import graft.config.EmOptions

/** Fellegi-Sunter EM over the aggregated gamma-pattern table.
  *
  * Faithful re-derivation of the reference's `emlinkMARmov`
  * (`/root/reference/src/emlink.jl:186-329`): missing-at-random handling
  * (gamma=3 cells skipped in the likelihood), per-feature monotone re-sort
  * of the m/u probability vectors every M-step (`emlink.jl:140-151`), and
  * optional lambda/pi Beta/Dirichlet priors (`emlink.jl:61-101`).
  *
  * Deliberate differences (documented, not accidental):
  *  - Runs on the **driver** over the tiny distinct-pattern table (<= 4^k
  *    rows) that the cluster produced via a partial+final hash aggregate —
  *    EM cost is independent of data scale.
  *  - `Double` log-space with log1p-based log-sum-exp replaces
  *    BigFloat-at-16-digits (`emlink.jl:44-46`): ~15.95 significant digits,
  *    same fixed point within the 1e-6 posterior-parity target.
  *  - Deterministic initialization: the *means* of the reference's random
  *    Dirichlet draws with concentrations 1,51,101,... (`emlink.jl:119-121`),
  *    ascending for m / descending for u. The reference's own tests tolerate
  *    any seed (the EM climbs to the same fixed point on separable data);
  *    determinism is required for reproducible pipelines.
  *  - delta uses abs (the reference's first overload lacks it —
  *    `emlink.jl:153` vs `:300` — a quirk, not semantics).
  */
object EmLink {

  /** One distinct gamma pattern: `gammas(c)` in {0,1,2} or -1 for missing. */
  final case class Pattern(gammas: Array[Int], count: Long)

  final case class PatternStats(
      gammas: Array[Int], // -1 = missing
      count: Long,
      weight: Double, // log p(gamma|M) - log p(gamma|U)
      pGammaJM: Double, // normalized exp(log p(gamma|M)) across patterns
      pGammaJU: Double,
      zeta: Double) // posterior match probability

  final case class EmResult(
      varnames: Seq[String],
      pM: Double,
      pU: Double,
      iterConverge: Int,
      converged: Boolean,
      /** The FULL comparison space the lambda prior scales against (nA*nB,
        * or N(N-1)/2 in dedupe mode) — BigInt because it exceeds Long
        * exactly where the north star lives: nA*nB overflows at ~3e9x3e9 and
        * N(N-1)/2 at N=2^32, while 10^12 documents give ~5e23. The SCORED
        * pair counts ([[PatternStats.count]]) stay Long — actual blocked
        * pairs, bounded by what was materialized.
        */
      numberOfComparisons: BigInt,
      patterns: Seq[PatternStats],
      /** per-feature, per observed level: P(gamma_k = level | M) */
      pGammaKM: Seq[Seq[Double]],
      pGammaKU: Seq[Seq[Double]],
      /** per-feature sorted distinct observed (non-missing) levels */
      uvals: Seq[Seq[Int]],
      thresholdMatch: Double) {
    def numberOfUniquePatterns: Int = patterns.size
    def matchedPatterns: Seq[PatternStats] = patterns.filter(_.zeta >= thresholdMatch)
  }

  private def logSumExp(lx: Double, ly: Double): Double =
    math.max(lx, ly) + math.log1p(math.exp(-math.abs(lx - ly)))

  /** Marsaglia-Tsang Gamma(alpha, 1) sampler (alpha >= 1 — the Dirichlet
    * concentrations here are 1, 51, 101, ...). Powers the opt-in seeded
    * random init; the deterministic default never calls it.
    */
  private def gammaDraw(alpha: Double, r: java.util.Random): Double = {
    val d = alpha - 1.0 / 3.0
    val c = 1.0 / math.sqrt(9.0 * d)
    while (true) {
      var x = 0.0
      var v = 0.0
      do { x = r.nextGaussian(); v = 1.0 + c * x } while (v <= 0)
      v = v * v * v
      val u = r.nextDouble()
      if (u < 1 - 0.0331 * x * x * x * x) return d * v
      if (math.log(u) < 0.5 * x * x + d * (1 - v + math.log(v))) return d * v
    }
    0.0 // unreachable
  }

  /** Convenience overload for Long-sized inputs; the comparison space is
    * computed in BigInt so `dims._1 * dims._2` cannot silently overflow.
    */
  def run(
      patterns: Seq[Pattern],
      dims: (Long, Long),
      varnames: Seq[String],
      opts: EmOptions = EmOptions()): EmResult =
    runBig(patterns, (BigInt(dims._1), BigInt(dims._2)), varnames, opts)

  def runBig(
      patterns: Seq[Pattern],
      dims: (BigInt, BigInt),
      varnames: Seq[String],
      opts: EmOptions): EmResult = {
    val nFeatures = varnames.size
    require(patterns.forall(_.gammas.length == nFeatures), "pattern arity != varnames")
    val nPat = patterns.size
    // the full comparison space (exact BigInt; Double only where it enters
    // the prior arithmetic, which is Double anyway)
    val space: BigInt = dims._1 * dims._2
    // Empty pattern table (e.g. one input side empty at runtime — an empty
    // increment table): a well-formed trivial result instead of NaN
    // parameters from 0/0 M-steps downstream.
    if (nPat == 0) {
      return EmResult(varnames, opts.pM0, 1 - opts.pM0, 0, converged = true,
        numberOfComparisons = space, patterns = Nil,
        pGammaKM = Seq.fill(nFeatures)(Nil), pGammaKU = Seq.fill(nFeatures)(Nil),
        uvals = Seq.fill(nFeatures)(Nil), thresholdMatch = opts.thresholdMatch)
    }
    val nJ = patterns.map(_.count.toDouble).toArray
    val sumN = nJ.sum
    val gam = patterns.map(_.gammas).toArray

    // ---- lambda prior hyperparameters (emlink.jl:61-77) ----
    var mu = 1.0
    var psi = 1.0
    if (opts.priorLambda != 0) {
      require(opts.wLambda > 0 && opts.wLambda <= 1, "w_lambda must be in (0,1]")
      val wl = if (opts.wLambda == 1.0) 1 - 1e-5 else opts.wLambda
      val cLambda = wl / (1 - wl)
      mu = opts.priorLambda * cLambda * space.toDouble + 1
      psi = (1 - opts.priorLambda) * mu / opts.priorLambda
    }
    // ---- pi prior hyperparameters (emlink.jl:79-101) ----
    var alpha0 = 1.0
    var alpha1 = 1.0
    val addressField: Array[Boolean] =
      if (opts.priorPi == 0) Array.fill(nFeatures)(false)
      else {
        require(opts.priorLambda != 0, "pi prior requires lambda prior")
        require(opts.wPi > 0 && opts.wPi <= 1, "w_pi must be in (0,1]")
        val wp = if (opts.wPi == 1.0) 1 - 1e-5 else opts.wPi
        val cPi = wp / (1 - wp)
        val expMatch = opts.priorLambda * space.toDouble
        alpha0 = cPi * opts.priorPi * expMatch + 1
        alpha1 = alpha0 * (1 - opts.priorPi) / opts.priorPi
        varnames.map(opts.addressFields.contains).toArray
      }

    // ---- per-feature observed levels + deterministic monotone init ----
    val uvals: Array[Array[Int]] = Array.tabulate(nFeatures) { c =>
      gam.map(_(c)).filter(_ >= 0).distinct.sorted
    }
    // level index of pattern j for feature c, or -1 if missing
    val levelIdx: Array[Array[Int]] = Array.tabulate(nFeatures) { c =>
      gam.map { g => if (g(c) < 0) -1 else uvals(c).indexOf(g(c)) }
    }
    val rng = opts.initSeed.map(new java.util.Random(_))
    def dirichlet(conc: Array[Double], r: java.util.Random): Array[Double] = {
      val g = conc.map(gammaDraw(_, r))
      val s = g.sum
      g.map(_ / s)
    }
    var pKM: Array[Array[Double]] = Array.tabulate(nFeatures) { c =>
      val conc = Array.tabulate(uvals(c).length)(i => 1.0 + 50.0 * i)
      rng match {
        case Some(r) => // seeded random draw, sorted ascending (emlink.jl:119-120)
          dirichlet(conc, r).sorted
        case None => // deterministic default: the Dirichlet means (ascending)
          val s = conc.sum
          conc.map(_ / s)
      }
    }
    var pKU: Array[Array[Double]] = rng match {
      case Some(r) => // independent draw per feature, sorted DESCENDING (emlink.jl:121)
        Array.tabulate(nFeatures) { c =>
          val conc = Array.tabulate(uvals(c).length)(i => 1.0 + 50.0 * i)
          dirichlet(conc, r).sorted.reverse
        }
      case None => pKM.map(_.reverse)
    }

    var pM = opts.pM0
    var pU = 1 - pM
    var delta = 1.0
    var iter = 1
    val logM = new Array[Double](nPat)
    val logU = new Array[Double](nPat)
    val zeta = new Array[Double](nPat)
    val numProd = new Array[Double](nPat)

    def flatParams(): Array[Double] =
      (Array(pM, pU) ++ pKM.flatten ++ pKU.flatten)

    while (delta >= opts.tol && iter <= opts.iterMax) {
      val pOld = flatParams()
      // E-step (emlink.jl:273-284)
      var j = 0
      while (j < nPat) {
        var lm = 0.0
        var lu = 0.0
        var c = 0
        while (c < nFeatures) {
          val li = levelIdx(c)(j)
          if (li >= 0) { lm += math.log(pKM(c)(li)); lu += math.log(pKU(c)(li)) }
          c += 1
        }
        logM(j) = lm
        logU(j) = lu
        val a = lm + math.log(pM)
        val b = lu + math.log(pU)
        zeta(j) = math.exp(a - logSumExp(a, b))
        numProd(j) = nJ(j) * zeta(j)
        j += 1
      }
      // M-step (emlink.jl:283-299)
      pM = (numProd.sum + mu - 1) / (psi - mu + sumN)
      pU = 1 - pM
      var c = 0
      while (c < nFeatures) {
        val nLev = uvals(c).length
        val kmRaw = new Array[Double](nLev)
        val kuRaw = new Array[Double](nLev)
        var jj = 0
        while (jj < nPat) {
          val li = levelIdx(c)(jj)
          if (li >= 0) {
            kmRaw(li) += numProd(jj)
            kuRaw(li) += nJ(jj) - numProd(jj)
          }
          jj += 1
        }
        // m: sort ascending, add address prior, normalize (emlink.jl:287-293)
        java.util.Arrays.sort(kmRaw)
        if (addressField(c)) {
          kmRaw(0) += alpha0
          var i = 1
          while (i < nLev) { kmRaw(i) += alpha1; i += 1 }
        }
        val kmSum = kmRaw.sum
        pKM(c) = kmRaw.map(_ / kmSum)
        // u: normalize, then sort descending (emlink.jl:294-298)
        val kuSum = kuRaw.sum
        val kuNorm = kuRaw.map(_ / kuSum)
        java.util.Arrays.sort(kuNorm)
        pKU(c) = kuNorm.reverse
        c += 1
      }
      val pNew = flatParams()
      delta = pNew.zip(pOld).map { case (a, b) => math.abs(a - b) }.max
      iter += 1
    }

    // weights + normalized pattern likelihoods from the last E-step
    // (emlink.jl:308-318)
    val expM = logM.map(math.exp)
    val expU = logU.map(math.exp)
    val sM = expM.sum
    val sU = expU.sum
    val stats = patterns.indices.map { j =>
      PatternStats(gam(j), patterns(j).count, logM(j) - logU(j),
        expM(j) / sM, expU(j) / sU, zeta(j))
    }
    EmResult(
      // Converged iff the loop exited on the delta condition — comparing the
      // post-increment iter to iterMax mislabels a run whose delta first
      // drops below tol exactly at iter == iterMax.
      varnames, pM, pU, iter, converged = delta < opts.tol,
      numberOfComparisons = space,
      patterns = stats,
      pGammaKM = pKM.map(_.toSeq).toSeq,
      pGammaKU = pKU.map(_.toSeq).toSeq,
      uvals = uvals.map(_.toSeq).toSeq,
      thresholdMatch = opts.thresholdMatch)
  }
}
