package graft.transform

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class TransformSpec extends SparkSpec {
  import spark.implicits._

  /** Run a ScalaCheck property under ScalaTest (no scalatestplus bridge in
    * the offline cache, so drive ScalaCheck's runner directly).
    */
  private def checkProp(p: Prop, n: Int = 50): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  // ------------------------------------------------------------ Normalize

  test("normalize matches the reference rename semantics (E1/E2/E3:54-58)") {
    assert(Normalize.name("CNPJ IF") == "cnpj_if")
    assert(Normalize.name("employer-website") == "employer_website")
    assert(Normalize.name("Recomendam para outras pessoas(%)") ==
      "recomendam_para_outras_pessoas(%)")
    // unicode survives (accents, en-dash U+2013 — SURVEY §1.2)
    assert(Normalize.name("Quantidade de Clientes – SCR") ==
      "quantidade_de_clientes_–_scr")
  }

  test("normalize is idempotent (property)") {
    checkProp(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val once = Normalize.name(s)
      val strict = Normalize.nameStrict(s)
      Normalize.name(once) == once && Normalize.nameStrict(strict) == strict
    })
  }

  test("normalize applies in a single projection over all columns") {
    val df = Seq((1, "x")).toDF("Col-One", "Col Two")
    val out = Normalize.columns(df)
    assert(out.columns.toSeq == Seq("col_one", "col_two"))
  }

  test("colliding normalized names are rejected") {
    val df = Seq((1, 2)).toDF("a b", "a-b")
    intercept[IllegalArgumentException](Normalize.columns(df))
  }

  test("targeted rename (E2:60-61)") {
    val df = Seq((1, "b")).toDF("cnpj_if", "instituição_financeira")
    val out = Normalize.rename(df, "cnpj_if" -> "cnpj",
      "instituição_financeira" -> "nome")
    assert(out.columns.toSeq == Seq("cnpj", "nome"))
  }

  // --------------------------------------------------------- Canonicalize

  test("rule table folds in order, mirroring the banks rules (E1:60-73)") {
    val rules = Seq(
      Canonicalize.Rule("nome", " - PRUDENCIAL", ""),
      Canonicalize.Rule("nome", "(\\.+|/+|\\-+)", " "),
      Canonicalize.Rule("nome", " SA$", ""),
      Canonicalize.Rule("nome", "\\s{2,}", " "))
    val df = Seq("BCO A.B/C-D - PRUDENCIAL", "BANCO X SA").toDF("nome")
    val out = Canonicalize(df, rules).as[String].collect().toSeq
    assert(out == Seq("BCO A B C D", "BANCO X"))
  }

  test("rules on absent columns are ignored; other columns untouched") {
    val df = Seq(("a-b", 1)).toDF("s", "n")
    val out = Canonicalize(df, Seq(Canonicalize.Rule("s", "-", "_"),
      Canonicalize.Rule("missing", ".", "x")))
    assert(out.columns.toSeq == Seq("s", "n"))
    assert(out.select("s").as[String].head() == "a_b")
  }

  test("no-op on non-matching strings (property)") {
    val rules = Seq(Canonicalize.Rule("s", "ZZZZ", "Q"))
    checkProp(Prop.forAll(Gen.alphaLowerStr) { v =>
      Canonicalize(Seq(v).toDF("s"), rules).as[String].head() == v
    }, n = 10)
  }

  // ------------------------------------------------------------ Harmonize

  test("union pads missing string columns with '' (G0a:56-66 semantics)") {
    val f1 = Seq((1L, "alice")).toDF("id", "name") // lacks segment
    val f2 = Seq((2L, "retail")).toDF("id", "segment") // lacks name
    val out = Harmonize.unionAll(Seq(f1, f2))
    assert(out.columns.toSeq == Seq("id", "name", "segment"))
    val rows = out.orderBy("id").collect()
    assert(rows(0).getString(1) == "alice" && rows(0).getString(2) == "")
    assert(rows(1).getString(1) == "" && rows(1).getString(2) == "retail")
  }

  test("union pads missing non-string columns with typed null") {
    val f1 = Seq((1L, 2.5)).toDF("id", "score")
    val f2 = Seq(3L).toDF("id")
    val out = Harmonize.unionAll(Seq(f1, f2)).orderBy("id").collect()
    assert(out(1).isNullAt(1))
  }

  // --------------------------------------------------------------- Enrich

  test("splitItem: double-space split, NULL when index out of range (E1:74)") {
    val df = Seq("BCO ALFA  Alfa Bank", "NOSPLIT").toDF("nome")
    val out = df.select(Enrich.splitItem(col("nome"), "  ", 1).as("fantasia"))
      .as[Option[String]].collect().toSeq
    assert(out == Seq(Some("Alfa Bank"), None))
  }

  test("remap: when/isin/otherwise (E4:37-38)") {
    val df = Seq("SF3 CRÉDITO X", "BANCO Y").toDF("nome")
    val out = df.select(Enrich.remap(col("nome"), Seq("SF3 CRÉDITO X"), "SF3").as("n"))
      .as[String].collect().toSeq
    assert(out == Seq("SF3", "BANCO Y"))
  }

  test("legacy string→int semantics under ANSI mode (SURVEY §4.4-c)") {
    val df = Seq("2,5", "2.5", "x", "-3.7", "4").toDF("v")
    val fixed = Enrich.commaToDot(col("v"))
    val out = df.select(
      Enrich.toDoubleOrNull(fixed).as("d"),
      Enrich.legacyStringToInt(fixed).as("i"))
      .collect().toSeq
    assert(out.map(r => Option(r.get(0))) ==
      Seq(Some(2.5), Some(2.5), None, Some(-3.7), Some(4.0)))
    // truncation toward zero, like the legacy cast: 2.5→2, -3.7→-3
    assert(out.map(r => Option(r.get(1))) ==
      Seq(Some(2), Some(2), None, Some(-3), Some(4)))
  }
}
