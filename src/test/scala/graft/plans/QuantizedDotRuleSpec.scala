package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.QuantizedDot

/** The injected optimizer rule that fuses the composed
  * `aggregate(zip_with(...))` dot product into the native
  * [[QuantizedDot]]: that it fires on exactly the sound pattern, that
  * it can be switched off through the standard
  * `spark.sql.optimizer.excludedRules` knob, and that the rewritten
  * and genuine-HOF plans agree value-for-value (the equivalence that
  * licenses rewriting in the optimizer at all). */
class QuantizedDotRuleSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private val ComposedSql =
    "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"

  private def rewritten(df: DataFrame): Boolean = {
    var found = false
    df.queryExecution.optimizedPlan.foreach(_.expressions.foreach(_.foreach {
      case _: QuantizedDot => found = true
      case _ =>
    }))
    found
  }

  /** range-backed frame so ConvertToLocalRelation can't pre-evaluate
    * the expression before the optimizedPlan is inspected. */
  private def rangeDf: DataFrame = {
    import spark.implicits._
    spark.range(64)
      .select(array($"id", $"id" * 2, -$"id").as("a"),
        array($"id" + 3, $"id", $"id" % 5).as("b"))
  }

  private def withExcluded[A](body: => A): A = {
    val key = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "graft.plans.QuantizedDotRule")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("rewrites the composed HOF pattern into the native expression") {
    val df = rangeDf.select(expr(ComposedSql).as("d"))
    assert(rewritten(df), df.queryExecution.optimizedPlan.toString)
    // and the fused plan computes the right values
    val got = df.collect().map(_.getLong(0)).toSeq
    val want = (0L until 64L).map(i => i * (i + 3) + (i * 2) * i + (-i) * (i % 5))
    assert(got == want)
  }

  test("commuted operand orders still match") {
    val df = rangeDf.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> y * x), CAST(0 AS BIGINT), (acc, v) -> v + acc)").as("d"))
    assert(rewritten(df), df.queryExecution.optimizedPlan.toString)
  }

  test("excludedRules disables it; genuine HOF path agrees on edge inputs") {
    import spark.implicits._
    val edges = Seq(
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](3L, 4L)),
      (null, Seq[java.lang.Long](1L)),
      (Seq[java.lang.Long](5L, 7L, 9L), Seq[java.lang.Long](2L)), // ragged
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](2L, 3L))) // null elem
      .toDF("a", "b")
    def vals(df: DataFrame): Seq[Option[Long]] =
      df.select(expr(ComposedSql).as("d")).collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    val genuine = withExcluded {
      assert(!rewritten(rangeDf.select(expr(ComposedSql).as("d"))),
        "exclusion did not take effect — composed reference would be vacuous")
      vals(edges)
    }
    assert(genuine == Seq(Some(11L), None, None, None))
    assert(vals(edges) == genuine, "rewritten path diverges from genuine HOF path")
  }

  test("property: rewritten and genuine plans agree on random inputs") {
    import spark.implicits._
    // ragged lengths and occasional nulls included on purpose
    val genVec = for {
      n <- Gen.choose(0, 8)
      v <- Gen.listOfN(n, Gen.frequency(
        9 -> Gen.choose(-1000000L, 1000000L).map(java.lang.Long.valueOf),
        1 -> Gen.const(null: java.lang.Long)))
    } yield v
    val p = Prop.forAll(Gen.listOfN(8, Gen.zip(genVec, genVec))) { rows =>
      val df = rows.toDF("a", "b").select(expr(ComposedSql).as("d"))
      def out(d: DataFrame): Seq[Option[Long]] = d.collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
      out(df) == withExcluded(out(rows.toDF("a", "b").select(expr(ComposedSql).as("d"))))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), p)
    assert(res.passed, res.status.toString)
  }

  private def withAnsi[A](on: Boolean)(body: => A): A = {
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", on.toString)
    try body finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("rewrites under BOTH arithmetic modes, carrying the mode over") {
    def dotOf(df: DataFrame): Option[QuantizedDot] = {
      var found: Option[QuantizedDot] = None
      df.queryExecution.optimizedPlan.foreach(_.expressions.foreach(_.foreach {
        case q: QuantizedDot => found = Some(q)
        case _ =>
      }))
      found
    }
    withAnsi(true) {
      val q = dotOf(rangeDf.select(expr(ComposedSql).as("d")))
      assert(q.exists(_.failOnError), s"ANSI tree must fuse to failOnError=true, got $q")
    }
    withAnsi(false) {
      val q = dotOf(rangeDf.select(expr(ComposedSql).as("d")))
      assert(q.exists(!_.failOnError), s"LEGACY tree must fuse to failOnError=false, got $q")
    }
  }

  test("ANSI overflow parity: fused and genuine paths both raise, legacy both wrap") {
    import spark.implicits._
    // overflow sits PAST a null element: zip_with materializes that
    // product before the fold goes null, so the genuine path throws —
    // the fused loop must too, not shortcut to null at the null
    val df = Seq((Seq[java.lang.Long](null, Long.MaxValue),
      Seq[java.lang.Long](1L, Long.MaxValue))).toDF("a", "b")
    def run(): Seq[Option[Long]] = df.select(expr(ComposedSql).as("d")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    withAnsi(true) {
      val fused = intercept[Exception](run())
      val genuine = withExcluded(intercept[Exception](run()))
      assert(fused.getMessage.contains("ARITHMETIC_OVERFLOW") ||
        fused.getCause != null && fused.getCause.getMessage.contains("ARITHMETIC_OVERFLOW"),
        s"fused: ${fused.getMessage}")
      assert(genuine.getMessage.contains("ARITHMETIC_OVERFLOW") ||
        genuine.getCause != null && genuine.getCause.getMessage.contains("ARITHMETIC_OVERFLOW"),
        s"genuine: ${genuine.getMessage}")
    }
    withAnsi(false) {
      // wrapping mode: a null anywhere nulls the fold on both paths
      assert(run() == Seq(None))
      assert(withExcluded(run()) == Seq(None))
      val wrap = Seq((Seq(Long.MaxValue), Seq(2L))).toDF("a", "b")
      def w(): Long = wrap.select(expr(ComposedSql).as("d")).head().getLong(0)
      assert(w() == Long.MaxValue * 2L) // wrapped, not thrown
      assert(withExcluded(w()) == Long.MaxValue * 2L)
    }
  }

  private val ComposedDoubleSql =
    "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  private def vecDotted(df: DataFrame): Boolean = {
    var found = false
    df.queryExecution.optimizedPlan.foreach(_.expressions.foreach(_.foreach {
      case _: graft.functions.VectorDot => found = true
      case _ =>
    }))
    found
  }

  test("DOUBLE twin: fuses to VectorDot, bit-identical to the genuine fold") {
    import spark.implicits._
    val doubleDf = spark.range(64).select(
      array($"id".cast("double") * 0.25, -$"id".cast("double"), lit(0.1)).as("a"),
      array($"id".cast("double"), lit(3.5), $"id".cast("double") * 0.5).as("b"))
    assert(vecDotted(doubleDf.select(expr(ComposedDoubleSql).as("d"))),
      "double pattern must fuse to VectorDot")

    // special values: NaN, infinities, signed zeros, ragged, null elem —
    // fold order is sequential in both paths, so bits must agree exactly
    val edges = Seq(
      (Seq[java.lang.Double](1.5, 2.25), Seq[java.lang.Double](4.0, -0.5)),
      (Seq[java.lang.Double](Double.NaN, 1.0), Seq[java.lang.Double](1.0, 2.0)),
      (Seq[java.lang.Double](Double.PositiveInfinity), Seq[java.lang.Double](Double.NegativeInfinity)),
      (Seq[java.lang.Double](-0.0, 0.0), Seq[java.lang.Double](5.0, -0.0)),
      (Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](1.0)), // ragged
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](2.0, 3.0))) // null elem
      .toDF("a", "b")
    def bits(d: DataFrame): Seq[Option[Long]] = d.select(expr(ComposedDoubleSql).as("d"))
      .collect().map(r => if (r.isNullAt(0)) None
        else Some(java.lang.Double.doubleToRawLongBits(r.getDouble(0)))).toSeq
    val fused = bits(edges)
    val genuine = withExcluded(bits(edges))
    assert(fused == genuine, s"fused $fused vs genuine $genuine")
    assert(fused(4).isEmpty && fused(5).isEmpty, "ragged/null-elem must be null")

    // a -0.0 seed is NOT the fold identity; the rule must decline
    val negZero = doubleDf.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), CAST('-0.0' AS DOUBLE), (acc, v) -> acc + v)").as("d"))
    assert(!vecDotted(negZero), "must not fire on a -0.0 seed")
  }

  test("ANSI codegen path: nulls, ragged, overflow behave like the genuine fold") {
    import spark.implicits._
    // range-backed input exercises the GENERATED Java for the
    // failOnError loop (a local Seq folds through interpreted eval
    // instead); nulls and ragged lengths injected with when()
    def base = spark.range(100).select(
      array($"id",
        when($"id" % 7 === 0, lit(null).cast("long")).otherwise($"id" * 3)).as("a"),
      array($"id" + 1, $"id" + 2).as("b"))
    withAnsi(true) {
      val fused = base.select(expr(ComposedSql).as("d"))
      assert(rewritten(fused))
      def vals(d: DataFrame): Seq[Option[Long]] = d.collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
      val got = vals(fused)
      assert(got == withExcluded(vals(base.select(expr(ComposedSql).as("d")))))
      assert(got.count(_.isEmpty) == 100 / 7 + 1, "null-element rows must be null")

      // ragged: b has 3 elements for even ids via a data-dependent slice
      val ragged = spark.range(20).select(
        array($"id").as("a"),
        when($"id" % 2 === 0, array($"id", $"id")).otherwise(array($"id")).as("b"))
        .select(expr(ComposedSql).as("d"))
      assert(vals(ragged) == (0L until 20L).map(i =>
        if (i % 2 == 0) None else Some(i * i)))

      // overflow in generated code raises the same error class
      val overflow = spark.range(4).select(
        array(lit(Long.MaxValue)).as("a"), array($"id" + 2).as("b"))
        .select(expr(ComposedSql).as("d"))
      val e = intercept[Exception](overflow.collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: msgs(t.getCause)
      assert(msgs(e).exists(m => m != null && m.contains("ARITHMETIC_OVERFLOW")),
        msgs(e).mkString(" | "))
    }
  }

  test("declines: mixed element types, extra arithmetic, non-zero seed") {
    import spark.implicits._
    val mixed = spark.range(4)
      .select(array($"id".cast("double")).as("a"), array($"id").as("b"))
      .select(expr(
        "aggregate(zip_with(a, b, (x, y) -> x * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)").as("d"))
    assert(!rewritten(mixed) && !vecDotted(mixed),
      "must not fire when the zip lambda carries a cast")

    val extra = rangeDf.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> x * y + 1L), CAST(0 AS BIGINT), (acc, v) -> acc + v)").as("d"))
    assert(!rewritten(extra), "must not fire on a non-bare zip lambda")

    val seeded = rangeDf.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(7 AS BIGINT), (acc, v) -> acc + v)").as("d"))
    assert(!rewritten(seeded), "must not fire on a non-zero seed")
  }
}
