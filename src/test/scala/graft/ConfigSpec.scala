package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.config._

/** Parses the reference's own nested config shape
  * (`/root/reference/test_parameters.json`).
  */
class ConfigSpec extends AnyFunSuite {

  private val json =
    """{
      |  "link_type": "link_only",
      |  "idvar": ["id", "id2"],
      |  "comparisons": {
      |    "name": "total",
      |    "prior_lambda": 0.000001,
      |    "w_lambda": 0.5,
      |    "threshold_match": 0.88,
      |    "variables": [
      |      {"varname": "firstname", "method": "fuzzy", "partial": true,
      |       "cut_a": 0.92, "cut_b": 0.88, "tf_adjust": true, "w": 0.1},
      |      {"varname": "middlename", "method": "exact"},
      |      {"comparisons": {
      |        "name": "address",
      |        "threshold_match": 0.92,
      |        "variables": [
      |          {"varname": "housenum", "method": "exact", "tf_adjust": true},
      |          {"varname": "streetname", "method": "jarowinkler", "w": 0.1,
      |           "tf_adjust": true, "tf_adjustment_weight": 0.25,
      |           "tf_minimum_u_value": 0.001}
      |        ]
      |      }}
      |    ]
      |  }
      |}""".stripMargin

  test("nested config parses with stages leaf-first") {
    val cfg = MatchConfig.fromJson(json)
    assert(cfg.idA == "id" && cfg.idB == "id2")
    assert(cfg.comparisons.name == "total")
    assert(cfg.comparisons.variables.map(_.varname) == Seq("firstname", "middlename"))
    assert(cfg.comparisons.children.map(_.name) == Seq("address"))
    assert(cfg.stages.map(_.name) == Seq("address", "total")) // leaf-first
    val st = cfg.comparisons.children.head.variables.find(_.varname == "streetname").get
    assert(st.tfAdjust && st.tfAdjustmentWeight == 0.25 && st.w == 0.1)
    assert(cfg.comparisons.em.priorLambda == 1e-6 && cfg.comparisons.em.wLambda == 0.5)
    assert(cfg.comparisons.em.thresholdMatch == 0.88)
    assert(cfg.comparisons.children.head.em.thresholdMatch == 0.92)
    assert(cfg.comparisons.allVariables.map(_.varname) ==
      Seq("firstname", "middlename", "housenum", "streetname"))
  }

  test("method aliases canonicalize") {
    assert(VariableSpec.canonical("jarowinkler") == "jw")
    assert(VariableSpec.canonical("JW") == "jw")
    assert(VariableSpec.canonical("dameraulevenshtein") == "dl")
    assert(VariableSpec.canonical("float") == "numeric")
    assert(VariableSpec.canonical("bool") == "exact")
    assertThrows[IllegalArgumentException](VariableSpec.canonical("nope"))
  }
}
