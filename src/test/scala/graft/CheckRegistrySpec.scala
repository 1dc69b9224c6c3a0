package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._

class CheckRegistrySpec extends AnyFunSuite {

  test("registry covers the 8 SupportedChecks + riOptimization") {
    assert(CheckRegistry.supported.map(_.id).toSet == Set(
      "Qch7DwouX1", "hjLMh88uM8", "DAvU99Dc4C", "Z4AUBRNSmz",
      "Ti39halfu8", "51fC20e7I2", "G31sQ1E9U", "1e93e4c0b5"))
    assert(CheckRegistry.all.length == 9)
  }

  test("header/mapping lengths agree (template:450-467)") {
    // enforced by CheckSpec's require; touch each to trigger it
    CheckRegistry.all.foreach(s => assert(s.header.nonEmpty))
    // spot-check the widest: EC2 low-util has 24 columns
    assert(CheckRegistry.lowUtilEc2.header.length == 24)
    assert(CheckRegistry.lowUtilEc2.mapping.take(2) ==
      Seq(Field("status"), Field("region")))
    assert(CheckRegistry.lowUtilEc2.mapping.last == MetaIdx(21))
  }

  test("table names are Glue-lowercased") {
    assert(CheckRegistry.lowUtilEc2.tableName == "check_qch7dwoux1")
    assert(CheckRegistry.riLeaseExpiration.tableName == "check_1e93e4c0b5")
  }

  test("schema-token parse: digit vs field dispatch") {
    assert(SchemaToken.parse("17") == MetaIdx(17))
    assert(SchemaToken.parse("status") == Field("status"))
    assert(SchemaToken.parseList("status,0,1") ==
      Seq(Field("status"), MetaIdx(0), MetaIdx(1)))
  }

  test("every tagged check's join key is one of its header columns") {
    CheckRegistry.all.flatMap(s => s.tagJoinKey.map((s, _))).foreach {
      case (s, k) => assert(s.header.contains(k), s"${s.id}: $k")
    }
  }
}
