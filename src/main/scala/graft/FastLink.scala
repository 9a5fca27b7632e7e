package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.config.MatchConfig
import graft.operators.{EmLink, Linker}

/** Reference-compatible entry point — the drop-in surface for a user of
  * `fastLink(dfA, dfB, config)` (`/root/reference/src/fastlink/fastlink.jl:14-129`),
  * taking the reference's JSON config shape verbatim
  * (`/root/reference/test_parameters.json`).
  *
  * Differences by design (Spark execution model, not semantics):
  *  - `blockCols` replaces the reference's dense all-pairs |A|x|B| matrix;
  *    pass Nil to reproduce all-pairs exactly (test scale only — the
  *    `Sum counts == |A|*|B|` identity then holds).
  *  - "ids" (the reference's per-pattern driver-side id-pair vectors,
  *    `indices_to_uids`) stays a DISTRIBUTED DataFrame keyed by pattern_id:
  *    collecting O(pairs) id tuples onto the driver is the one reference
  *    behavior that cannot survive scale. `idPairs(patternId)` filters one
  *    pattern; `result.matches()` thresholds.
  */
object FastLink {

  /** The reference's output Dict, typed: EM results + distributed id pairs
    * (+ TF-adjusted pair scores when any variable has tf_adjust).
    */
  final case class FastLinkResult(
      idvar: (String, String),
      link: Linker.LinkResult) {
    def resultsEM: EmLink.EmResult = link.em
    /** patterns_w twin: gammas, counts, weights, p_gamma_jm/ju, zeta_j. */
    def patternsW: DataFrame = link.patternStats
    /** id pairs of one pattern (the reference's `ids[i]`), distributed. */
    def idPairs(patternId: Int): DataFrame =
      link.pairs.filter(col("pattern_id") === patternId).select("id_a", "id_b")
    /** reference getMatches(output, threshold). */
    def getMatches(threshold: Option[Double] = None): DataFrame =
      link.matches(threshold)
    /** reference tf_adj_table. */
    def tfAdjTable: DataFrame = link.tfAdjTable
  }

  /** fastLink(dfA, dfB, configJson) — config is the reference's JSON.
    *
    * Dispatches on the config's `link_type` (which the reference parses but
    * never reads — a `dedupe_only` config there silently runs A x B linkage):
    * `dedupe_only` self-links dfA; `link_and_dedupe` dedupes the stacked
    * dfA UNION dfB (so cross-table matches AND within-table duplicates both
    * surface, each unordered pair once); anything else is plain A x B.
    */
  def link(
      dfA: DataFrame,
      dfB: DataFrame,
      configJson: String,
      blockCols: Seq[String] = Nil,
      maxBlockRows: Option[Long] = None,
      fanoutPartitions: Option[Int] = None): FastLinkResult = {
    val cfg = MatchConfig.fromJson(configJson)
    val res = cfg.linkType match {
      case "dedupe_only" =>
        dedupe(dfA, cfg, blockCols, maxBlockRows, fanoutPartitions)
      case "link_and_dedupe" =>
        // stack A over B, reconciling the id columns (B's idB renamed to
        // idA so unionByName lines up). CONTRACT: id values must be unique
        // ACROSS the two tables — a shared id value would make a legitimate
        // cross-table pair a self-pair (dropped by the id_a < id_b cut) and
        // duplicate ids corrupt the pair space and EM pattern counts. The
        // contract is enforced here at runtime (id-column-only semi-join,
        // column-pruned scans) rather than trusted: silent wrong matches are
        // the worst failure mode a linkage engine has.
        val bAligned =
          if (cfg.idA == cfg.idB) dfB
          else dfB.withColumnRenamed(cfg.idB, cfg.idA)
        val shared = dfA.select(col(cfg.idA))
          .join(bAligned.select(col(cfg.idA)), Seq(cfg.idA), "left_semi")
          .limit(1).collect()
        require(shared.isEmpty,
          s"link_and_dedupe requires id values unique ACROSS dfA and dfB, " +
            s"but both contain ${cfg.idA}=${shared.headOption.map(_.get(0)).orNull}. " +
            "Disambiguate before calling (e.g. offset or tag-prefix one side's ids).")
        dedupe(dfA.unionByName(bAligned), cfg, blockCols, maxBlockRows,
          fanoutPartitions)
      case _ =>
        Linker.link(dfA, dfB, cfg, blockCols = blockCols,
          maxBlockRows = maxBlockRows, fanoutPartitions = fanoutPartitions)
    }
    FastLinkResult((cfg.idA, cfg.idB), res)
  }

  /** Dedupe mode: self-link of one table, each unordered pair once
    * (id_a < id_b). The reference's `link_type=dedupe_only` is declared but
    * never implemented (`config["link_type"]` is never read by src/ code);
    * this is the working equivalent.
    *
    * The `id_a < id_b` cut is applied BEFORE pattern aggregation/EM (as a
    * pair filter), not after: a full self-cross would feed EM N guaranteed
    * self-pairs (all-agree patterns) plus every unordered pair twice, biasing
    * p_m and the all-agree pattern's zeta upward. The comparison space EM
    * scales against (lambda prior, numberOfComparisons) is N(N-1)/2 to
    * match — not N*N.
    */
  def dedupe(
      df: DataFrame,
      cfg: MatchConfig,
      blockCols: Seq[String],
      maxBlockRows: Option[Long] = None,
      fanoutPartitions: Option[Int] = None): Linker.LinkResult =
    Linker.link(df.withColumnRenamed(cfg.idA, "__ida"),
      df.withColumnRenamed(cfg.idA, "__idb"),
      cfg.copy(idA = "__ida", idB = "__idb"),
      blockCols = blockCols, maxBlockRows = maxBlockRows,
      fanoutPartitions = fanoutPartitions,
      pairFilter = Some(col("id_a") < col("id_b")),
      // NOT an inline n*(n-1)/2: that Long product silently wraps negative
      // beyond ~3e9 rows; the shared BigInt form is exact at any scale
      comparisonSpace = Some(operators.Checkpoints.dedupeComparisonSpace))
}
