package graft

import org.apache.spark.sql.functions._
import graft.functions.{Functions, Trigram}

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("trigram set matches pg_trgm semantics") {
    // pg_trgm pads each word with 2 leading + 1 trailing space:
    // show_trgm('cat') = {"  c"," ca","at ","cat"}
    val t = Trigram.trigrams("cat")
    assert(t.size == 4)
    assert(t.contains("  c") && t.contains(" ca") &&
      t.contains("cat") && t.contains("at "))
  }

  test("trigram lowercases and splits on non-alphanumerics") {
    val a = Trigram.trigrams("Foo-Bar")
    val b = Trigram.trigrams("foo bar")
    assert(a == b)
  }

  test("trigram similarity identical=1, disjoint=0") {
    assert(Trigram.similarity("hello world", "hello world") == 1.0)
    assert(Trigram.similarity("abc", "xyz") == 0.0)
    assert(Trigram.similarity("", "") == 0.0)
    // pg_trgm: similarity('word','two words') = 0.36363637 (8/22)
    val s = Trigram.similarity("word", "two words")
    assert(math.abs(s - 4.0 / 11.0) < 1e-9, s"got $s")
  }

  test("nb_parse_election_name maps codes") {
    Functions.register(spark)
    val df = Seq(("2012-05-01", "pr"), ("2013-11-02", "ge"),
      ("2014-01-01", "xx")).toDF("d", "t")
      .selectExpr("nb_parse_election_name(d, t) as name")
    assert(df.as[String].collect().toSeq ==
      Seq("2012_primary", "2013_general", "2014_xx"))
  }

  test("nb_coerce_to_date_or_null safe-casts") {
    Functions.register(spark)
    val out = Seq("2020-02-29", "garbage", "2021-13-45").toDF("d")
      .selectExpr("nb_coerce_to_date_or_null(d) as d").collect()
    assert(out(0).getDate(0).toString == "2020-02-29")
    assert(out(1).isNullAt(0) && out(2).isNullAt(0))
  }

  test("nb_is_email_address_valid replicates the reference regex") {
    Functions.register(spark)
    val cases = Seq(
      ("", true),            // empty → valid (reference quirk)
      ("a@b.co", true),
      ("no-at-sign.com", false),
      ("has space@x.com", false),
      ("a@b", false))        // no dot-suffix
    val df = cases.map(_._1).toDF("e")
      .selectExpr("e", "nb_is_email_address_valid(e) as v").collect()
    cases.zip(df).foreach { case ((in, want), row) =>
      assert(row.getBoolean(1) == want, s"case '$in'")
    }
  }

  test("Column-API email validity agrees with the registered UDF") {
    Functions.register(spark)
    val df = Seq("a@b.co", "nope", "x@y", "a.b@c.de.fg").toDF("e")
      .select(col("e"),
        Functions.isEmailAddressValid(col("e")).as("a"),
        expr("nb_is_email_address_valid(e)").as("b"))
    assert(df.filter(col("a") =!= col("b")).count() == 0)
  }

  test("loadExtension installs one named extension, rejects unknown") {
    // fresh session state → isolated function registry
    val s2 = spark.newSession()
    assert(!s2.catalog.functionExists("nb_coerce_to_date_or_null"))
    Functions.loadExtension(s2, "nb_coerce_to_date_or_null")
    assert(s2.catalog.functionExists("nb_coerce_to_date_or_null"))
    // only the requested one was installed
    assert(!s2.catalog.functionExists("nb_parse_election_name"))
    intercept[IllegalArgumentException] {
      Functions.loadExtension(s2, "no_such_extension")
    }
  }
}
