package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Literal
import org.scalatest.funsuite.AnyFunSuite

/** The config-only extension entry point registers every graft
  * function into a session's FunctionRegistry — asserted through
  * `SparkSessionExtensions.registerFunctions`, the exact hook a
  * session built with `spark.sql.extensions=graft.GraftExtensions`
  * runs at startup.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("injects all graft functions and they resolve + evaluate") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = org.apache.spark.sql.GraftExtensionsTestBridge.register(
      ext, FunctionRegistry.builtin.clone())
    Seq("graft_cosine", "graft_dot", "graft_fingerprint64", "graft_mix64",
      "graft_minhash", "graft_simhash", "graft_capped_postings").foreach { n =>
      assert(reg.functionExists(FunctionIdentifier(n)), s"$n not registered")
    }
    val dot = reg.lookupFunction(FunctionIdentifier("graft_dot"),
      Seq(Literal.create(Array(1.0, 2.0)), Literal.create(Array(3.0, 4.0))))
    assert(dot.eval(null) === 11.0)
    val mix = reg.lookupFunction(FunctionIdentifier("graft_mix64"), Seq(Literal(25027L)))
    assert(mix.eval(null) === graft.functions.Mix64.mix(25027L))
  }

  test("normalize_text resolves through the extension registry and composes with fingerprint64") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = org.apache.spark.sql.GraftExtensionsTestBridge.register(
      ext, FunctionRegistry.builtin.clone())
    val norm = reg.lookupFunction(FunctionIdentifier("graft_normalize_text"),
      Seq(Literal(org.apache.spark.unsafe.types.UTF8String.fromString("A  B"))))
    assert(norm.eval(null).toString === "a b")
    val fp = reg.lookupFunction(FunctionIdentifier("graft_fingerprint64"), Seq(norm))
    assert(fp.eval(null) ===
      graft.functions.Fingerprint64.hash(org.apache.spark.unsafe.types.UTF8String.fromString("a b")))
  }

  test("rejects a non-literal k for the minhash aggregate") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = org.apache.spark.sql.GraftExtensionsTestBridge.register(
      ext, FunctionRegistry.builtin.clone())
    intercept[IllegalArgumentException] {
      reg.lookupFunction(FunctionIdentifier("graft_minhash"),
        Seq(Literal(1L), Literal.create(Array(1))))
    }
  }
}
