package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The native NFC expression: semantics against the JDK normalizer,
  * the no-allocation identity fast path, null propagation, and the
  * registered SQL surface. All non-ASCII is written as \u escapes so
  * the asserted forms are unambiguous. (The codegen/interpreted twin
  * runs suite-wide via the matrix's no_cg cell.) */
class NfcNormalizeSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  test("composes decomposed sequences; identity on NFC input") {
    import spark.implicits._
    val rows = Seq(
      ("a", "café"),              // e + combining acute
      ("b", "café"),               // precomposed
      ("c", "Ångström"),    // ring + diaeresis, mixed in
      ("d", "plain ascii"),
      ("e", "𝒜́")       // astral letter: no composition exists
    ).toDF("id", "s")
    val out = rows.select($"id",
        GraftFunctions.nfcNormalize($"s").as("n"),
        org.apache.spark.sql.functions.length(
          GraftFunctions.nfcNormalize($"s")).as("len"))
      .orderBy($"id").collect()
    assert(out(0).getString(1) == "café" && out(0).getInt(2) == 4)
    assert(out(1).getString(1) == "café")
    assert(out(2).getString(1) == "Ångström")
    assert(out(3).getString(1) == "plain ascii")
    // the combining mark survives un-composed on the astral letter
    assert(out(4).getString(1) == "𝒜́")
  }

  test("null propagates; helper returns the same object on clean input") {
    import spark.implicits._
    val out = Seq(Option.empty[String], Some("x"))
      .toDF("s").select(GraftFunctions.nfcNormalize($"s").as("n")).collect()
    assert(out.exists(_.isNullAt(0)) && out.exists(r => !r.isNullAt(0)))
    val clean = org.apache.spark.unsafe.types.UTF8String.fromString("ascii only")
    assert(NfcNormalize.normalize(clean) eq clean)
  }

  test("strip_accents: both arrival forms strip to bases; ASCII is identity") {
    import spark.implicits._
    val out = Seq(
      ("a", "café"),     // decomposed mark
      ("b", "café"),      // precomposed
      ("c", "Ångström"),
      ("d", "plain")
    ).toDF("id", "s")
      .select($"id", GraftFunctions.stripAccents($"s").as("n"))
      .orderBy($"id").collect()
    assert(out(0).getString(1) == "cafe")
    assert(out(1).getString(1) == "cafe")
    assert(out(2).getString(1) == "Angstrom")
    assert(out(3).getString(1) == "plain")
    val clean = org.apache.spark.unsafe.types.UTF8String.fromString("plain")
    assert(StripAccents.strip(clean) eq clean)
  }

  test("registered SQL surface resolves; interpreted eval agrees") {
    val df = spark.sql("SELECT nfc_normalize('plain') AS n")
    assert(df.collect()(0).getString(0) == "plain")
    val expr = NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        org.apache.spark.unsafe.types.UTF8String.fromString("é"),
        org.apache.spark.sql.types.StringType))
    assert(expr.eval(null).toString == "é")
  }
}
