package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only shim: `SparkSessionExtensions.registerFunctions` is
  * `private[sql]`; this re-exports it so the spec can drive the exact
  * hook a `spark.sql.extensions`-configured session runs at startup.
  */
object GraftExtensionsTestBridge {
  def register(ext: SparkSessionExtensions, reg: FunctionRegistry): FunctionRegistry =
    ext.registerFunctions(reg)
}
