package graft

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** CI gate for the `python/graft_store` binding: runs the package's own
  * end-to-end script (the FeatureStoreSpec lifecycle fixtures driven
  * through the Py4J wrapper AND the SQL catalog in one PySpark
  * session) as a subprocess. Cancels — not fails — when no usable
  * python3+pyspark is on the PATH, so the suite stays green on
  * JVM-only hosts while enforcing the binding wherever it can run.
  *
  * The script needs compiled classes on the driver classpath; under
  * `sbt test` they exist by construction (test compilation depends on
  * Compile/compile).
  */
class PythonBindingSpec extends AnyFunSuite {

  private def pysparkUsable: Boolean =
    try {
      Seq("python3", "-c", "import pyspark, py4j").!(ProcessLogger(_ => ())) == 0
    } catch { case _: Exception => false }

  test("python binding end-to-end script is green") {
    assume(pysparkUsable, "python3 with pyspark not available on this host")
    val repoRoot = new java.io.File(".").getCanonicalFile
    val script = new java.io.File(repoRoot, "python/tests/test_feature_store.py")
    assert(script.isFile, s"missing $script")
    val out = new StringBuilder
    val code = Process(
      Seq("python3", script.getPath),
      cwd = repoRoot).!(ProcessLogger(l => { out.append(l).append('\n'); () }))
    assert(
      code == 0 && out.toString.contains("PYTHON BINDING CHECKS GREEN"),
      s"python binding script failed (exit $code):\n${out.toString.takeRight(4000)}")
  }
}
