package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.types.{SqlTypes, Template}

class TypesSpec extends AnyFunSuite {

  test("SQL type names map to Spark types") {
    assert(SqlTypes.toDataType("TEXT") == StringType)
    assert(SqlTypes.toDataType("text") == StringType)
    assert(SqlTypes.toDataType("INT") == IntegerType)
    assert(SqlTypes.toDataType("SERIAL") == LongType)
    assert(SqlTypes.toDataType("BOOLEAN") == BooleanType)
    assert(SqlTypes.toDataType("DECIMAL") == DecimalType(38, 10))
    assert(SqlTypes.toDataType("DECIMAL(18,2)") == DecimalType(18, 2))
    assert(SqlTypes.toDataType("NUMERIC(10)") == DecimalType(10, 0))
    assert(SqlTypes.toDataType("DATE") == DateType)
    assert(SqlTypes.toDataType("uuid") == StringType)
    assert(SqlTypes.toDataType("GEOMETRY(Geometry,4326)")
      .isInstanceOf[StructType])
    intercept[IllegalArgumentException](SqlTypes.toDataType("NOPE"))
  }

  test("$S/$T substitution quotes and qualifies references") {
    assert(Template.substitute("$S + 1", Some("col")) == "`col` + 1")
    assert(Template.substitute("$T = $S", Some("s.a"), Some("t.b")) ==
      "`t`.`b` = `s`.`a`")
    assert(Template.substitute("'const'", Some("x")) == "'const'")
  }

  test("template side detection") {
    assert(Template.referencesTarget("$T || $S"))
    assert(!Template.referencesTarget("$S IS NOT NULL"))
    assert(Template.referencesSource("$S > 2"))
    assert(!Template.referencesSource("'lit'"))
  }
}
