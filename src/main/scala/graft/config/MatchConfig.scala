package graft.config

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Typed match configuration — the engine's "query language".
  *
  * Mirrors the reference's JSON config semantics
  * (`/root/reference/README.md:22-59`, parse at
  * `/root/reference/src/settings/settings.jl:65-100`) as a Scala case-class
  * tree instead of Dict-walking. A config names the id columns, a tree of
  * comparison groups (nested groups = hierarchical "subquery" stages,
  * reference H1-H3), and per-variable comparison specs.
  */
final case class VariableSpec(
    varname: String,
    method: String, // canonical: jw|jaro|lv|dl|osa|hamming|ro|exact|bool|numeric|fuzzy
    cutA: Double = 0.92,
    cutB: Double = 0.88,
    partial: Boolean = true,
    w: Double = 0.1, // Winkler prefix weight
    tfAdjust: Boolean = false,
    tfMinimumUValue: Double = 0.001,
    tfAdjustmentWeight: Double = 1.0,
    /** Force/forbid the distinct-value rewrite (reference's pooled kernels,
      * `gammaCKpar.jl:92-106`); None = cost-based auto decision.
      */
    distinctRewrite: Option[Boolean] = None) {
  def canonicalMethod: String = VariableSpec.canonical(method)
  def isFuzzyString: Boolean =
    Set("jw", "jaro", "lv", "dl", "osa", "hamming", "ro", "fuzzy")(canonicalMethod)
}

object VariableSpec {
  /** Method-name aliases (reference `/root/reference/src/FastLink.jl:11-30`).
    * Unlike the reference, `ro`/`osa`/`hamming` actually work here (the
    * reference dispatches them but never imports their types —
    * `src/gammas/Gammas.jl:3` — a latent UndefVarError we fix, not port).
    */
  def canonical(method: String): String = method.toLowerCase match {
    case "jw" | "jarowinkler" | "jaro winkler" | "jaro-winkler" => "jw"
    case "jaro"                                                 => "jaro"
    case "lv" | "levenshtein"                                   => "lv"
    case "dl" | "dameraulevenshtein" | "damerau levenshtein" | "damerau-levenshtein" => "dl"
    case "osa" | "optimalstringalignment"                       => "osa"
    case "hamming"                                              => "hamming"
    case "ro" | "ratcliffobershelp" | "ratcliff obershelp"      => "ro"
    case "string"                                               => "jw"
    case "exact" | "bool"                                       => "exact"
    case "numeric" | "float" | "int"                            => "numeric"
    case "fuzzy"                                                => "fuzzy"
    case other => throw new IllegalArgumentException(s"unknown comparison method: $other")
  }
}

/** A (possibly nested) comparison group. Children run first (leaf-first,
  * reference `settings.jl:91-100`); a child's thresholded match verdict is
  * binarized into a synthetic gamma variable of the parent
  * (reference `patterns.jl:232-259`).
  */
final case class ComparisonGroup(
    name: String,
    variables: Seq[VariableSpec] = Nil,
    children: Seq[ComparisonGroup] = Nil,
    em: EmOptions = EmOptions()) {
  /** All leaf variable specs in this subtree. */
  def allVariables: Seq[VariableSpec] = variables ++ children.flatMap(_.allVariables)
}

/** EM hyperparameters (reference `emlink.jl:37-40` keyword args). */
final case class EmOptions(
    pM0: Double = 0.1,
    iterMax: Int = 5000,
    tol: Double = 1e-5,
    priorLambda: Double = 0.0,
    wLambda: Double = 0.0,
    priorPi: Double = 0.0,
    wPi: Double = 0.0,
    addressFields: Set[String] = Set.empty,
    thresholdMatch: Double = 0.85,
    /** None (default): deterministic init from the Dirichlet *means* —
      * reproducible pipelines. Some(seed): seeded random Dirichlet draws
      * with the reference's concentrations 1,51,101,...
      * (`/root/reference/src/emlink.jl:119-121`) for users replicating
      * reference runs distributionally.
      */
    initSeed: Option[Long] = None)

final case class MatchConfig(
    idA: String,
    idB: String,
    linkType: String = "link_only",
    comparisons: ComparisonGroup) {

  /** Leaf-first stage order: every child group before its parent
    * (reference `parse_configuration`, `settings.jl:91-100`).
    */
  def stages: Seq[ComparisonGroup] = MatchConfig.postOrder(comparisons)
}

object MatchConfig {
  private[config] def postOrder(g: ComparisonGroup): Seq[ComparisonGroup] =
    g.children.flatMap(postOrder) :+ g

  /** Parses the reference's JSON config shape (`test_parameters.json`). */
  def fromJson(json: String): MatchConfig = {
    implicit val fmts: Formats = DefaultFormats
    val root = JsonMethods.parse(json)
    val ids = (root \ "idvar").extract[Seq[String]]
    val linkType = (root \ "link_type").extractOrElse[String]("link_only")
    def parseGroup(j: JValue): ComparisonGroup = {
      val name = (j \ "name").extractOrElse[String]("comparisons")
      val vars = (j \ "variables") match {
        case JArray(items) => items
        case JNothing      => Nil
        case other         => List(other)
      }
      val (leaves, subgroups) = vars.partition(v => (v \ "varname") != JNothing)
      val specs = leaves.map { v =>
        VariableSpec(
          varname = (v \ "varname").extract[String],
          method = (v \ "method").extract[String],
          cutA = (v \ "cut_a").extractOrElse[Double](0.92),
          cutB = (v \ "cut_b").extractOrElse[Double](0.88),
          partial = (v \ "partial").extractOrElse[Boolean](true),
          w = (v \ "w").extractOrElse[Double](0.1),
          tfAdjust = (v \ "tf_adjust").extractOrElse[Boolean](false),
          tfMinimumUValue = (v \ "tf_minimum_u_value").extractOrElse[Double](0.001),
          tfAdjustmentWeight = (v \ "tf_adjustment_weight").extractOrElse[Double](1.0))
      }
      val kids = subgroups.map(v => parseGroup(v \ "comparisons"))
      val em = EmOptions(
        pM0 = (j \ "p_m").extractOrElse[Double](0.1),
        iterMax = (j \ "iter_max").extractOrElse[Int](5000),
        tol = (j \ "tol").extractOrElse[Double](1e-5),
        priorLambda = (j \ "prior_lambda").extractOrElse[Double](0.0),
        wLambda = (j \ "w_lambda").extractOrElse[Double](0.0),
        priorPi = (j \ "prior_pi").extractOrElse[Double](0.0),
        wPi = (j \ "w_pi").extractOrElse[Double](0.0),
        addressFields = (j \ "address_field").extractOrElse[Seq[String]](Nil).toSet,
        thresholdMatch = (j \ "threshold_match").extractOrElse[Double](0.85))
      ComparisonGroup(name, specs, kids, em)
    }
    MatchConfig(ids.head, ids(1), linkType, parseGroup(root \ "comparisons"))
  }
}
