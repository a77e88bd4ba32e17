package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.{ApplyFunctionExpression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.objects.Invoke
import org.apache.spark.unsafe.types.UTF8String

/** The DSv2 FunctionCatalog surface (GraftFunctionCatalog): catalog
  * resolution, plan-identity with the extension-registered twins via
  * V2NativeFunctionRule, and the no-extensions fallback paths. */
class FunctionCatalogSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = graft.SparkTestSession.spark
    s.conf.set("spark.sql.catalog.graft",
      classOf[GraftFunctionCatalog].getName)
    s
  }

  private def optimized(sql: String) =
    spark.sql(sql).queryExecution.optimizedPlan

  test("catalog call rewrites to the SAME native node as the extension twin") {
    // range-backed, not a LocalRelation — ConvertToLocalRelation would
    // otherwise evaluate the projection away and leave nothing to assert
    spark.range(4).selectExpr("concat('cafe', CAST(id AS STRING)) AS raw")
      .createOrReplaceTempView("fc_docs")
    val viaCatalog = optimized("SELECT graft.fn.nfc_normalize(raw) AS x FROM fc_docs")
    val viaExt = optimized("SELECT nfc_normalize(raw) AS x FROM fc_docs")
    assert(viaCatalog.canonicalized == viaExt.canonicalized,
      s"plans differ:\n$viaCatalog\nvs\n$viaExt")
    val nodes = viaCatalog.expressions.flatMap(_.collect {
      case n: NfcNormalize => n
      case a: ApplyFunctionExpression => a
      case i: Invoke => i
    })
    assert(nodes.exists(_.isInstanceOf[NfcNormalize]), "native node missing")
    assert(!nodes.exists(_.isInstanceOf[ApplyFunctionExpression]) &&
      !nodes.exists(_.isInstanceOf[Invoke]),
      "V2 invocation shape survived optimization — V2NativeFunctionRule did not fire")
  }

  test("all catalog functions equal their extension twins row-for-row") {
    import spark.implicits._
    Seq("café one", "Å two", "öü three", "ascii four")
      .toDF("raw").createOrReplaceTempView("fc_all")
    val n = spark.sql(
      """SELECT count(*) AS bad FROM fc_all WHERE NOT (
        |  graft.fn.nfc_normalize(raw) = nfc_normalize(raw) AND
        |  graft.fn.strip_accents(raw) = strip_accents(raw) AND
        |  graft.fn.bpe_encode(split(strip_accents(raw), ' ')[1]) =
        |    bpe_encode(split(strip_accents(raw), ' ')[1]) AND
        |  graft.fn.bpe_encode_bytes(split(raw, ' ')[0]) =
        |    bpe_encode_bytes(split(raw, ' ')[0]) AND
        |  graft.fn.bpe_decode_bytes(graft.fn.bpe_encode_bytes(split(raw, ' ')[0])) =
        |    split(raw, ' ')[0] AND
        |  graft.fn.bpe_pretokenize(raw) = bpe_pretokenize(raw) AND
        |  graft.fn.unigram_encode(split(strip_accents(raw), ' ')[1]) =
        |    unigram_encode(split(strip_accents(raw), ' ')[1]) AND
        |  graft.fn.quantized_dot(array(1L, 2L), array(3L, 4L)) =
        |    quantized_dot(array(1L, 2L), array(3L, 4L)))""".stripMargin)
      .collect()(0).getLong(0)
    assert(n == 0)
  }

  test("listFunctions / loadFunction surface and loud unknowns") {
    import org.apache.spark.sql.connector.catalog.Identifier
    val cat = new GraftFunctionCatalog
    cat.initialize("graft", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Collections.emptyMap()))
    val listed = cat.listFunctions(Array("fn")).map(_.name).toSet
    assert(listed == GraftFunctionCatalog.Functions.keySet)
    assert(cat.loadFunction(Identifier.of(Array("fn"), "nfc_normalize"))
      .name() == "nfc_normalize")
    intercept[Exception](cat.loadFunction(Identifier.of(Array("fn"), "nope")))
    intercept[Exception](cat.listFunctions(Array("other")))
    intercept[Exception] {
      spark.sql("SELECT graft.fn.no_such_fn('x')").collect()
    }
  }

  test("produceResult fallback evaluates the same native expression") {
    val fn = GraftFunctionCatalog.Functions("nfc_normalize")
      .asInstanceOf[GraftScalarFn]
    val in = UTF8String.fromString("café")
    val viaRow = fn.produceResult(new GenericInternalRow(Array[Any](in)))
    assert(viaRow == UTF8String.fromString("café"))
    // the magic-method path (Invoke target on a no-extensions session)
    assert(fn.invoke(in) == UTF8String.fromString("café"))
    // null flows through the native expression's null semantics
    assert(fn.produceResult(new GenericInternalRow(Array[Any](null))) == null)
  }

  test("quantized_dot catalog form keeps the extension form's semantics") {
    // equal lengths → the dot; ragged lengths → NULL (the extension
    // twin's non-ANSI contract, gated in depth elsewhere)
    val r = spark.sql(
      """SELECT graft.fn.quantized_dot(array(2L, 3L), array(5L, 7L)) AS v,
        |       graft.fn.quantized_dot(array(2L, 3L, 9L), array(5L, 7L)) AS ragged
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) == 2L * 5L + 3L * 7L)
    assert(r.isNullAt(1))
  }
}
