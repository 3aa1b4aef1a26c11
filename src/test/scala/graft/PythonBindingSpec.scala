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

  /** The gate must be HONEST about "usable": pyspark importable AND the
    * same major.minor as the Spark these classes compiled against — a
    * pip-installed mismatched pyspark would load our classes into its
    * own JVM and fail on binary incompatibility, turning a host
    * problem into a suite red.
    */
  private def pysparkVersion: Option[String] = {
    val out = new StringBuilder
    try {
      val code = Seq("python3", "-c", "import pyspark; print(pyspark.__version__)")
        .!(ProcessLogger(l => { out.append(l); () }))
      if (code == 0) Some(out.toString.trim) else None
    } catch { case _: Exception => None }
  }

  private def majorMinor(v: String): String =
    v.split('.').take(2).mkString(".")

  test("python binding end-to-end script is green") {
    val pyVer = pysparkVersion
    assume(pyVer.isDefined, "python3 with pyspark not available on this host")
    assume(
      majorMinor(pyVer.get) == majorMinor(org.apache.spark.SPARK_VERSION),
      s"pyspark ${pyVer.get} does not match compiled Spark " +
        s"${org.apache.spark.SPARK_VERSION}")
    val repoRoot = new java.io.File(".").getCanonicalFile
    val script = new java.io.File(repoRoot, "python/tests/test_feature_store.py")
    assert(script.isFile, s"missing $script")
    val out = new StringBuilder
    // bounded: a hung PySpark gateway (port contention, JAVA_HOME
    // drift) must fail THIS test with the captured output, never hang
    // the whole suite — process.destroy after the deadline
    val proc = Process(Seq("python3", script.getPath), cwd = repoRoot)
      .run(ProcessLogger(l => out.synchronized { out.append(l).append('\n'); () }))
    val deadline = System.nanoTime() + 5L * 60 * 1000 * 1000 * 1000
    var code = Option.empty[Int]
    while (code.isEmpty && System.nanoTime() < deadline) {
      if (proc.isAlive()) Thread.sleep(500) else code = Some(proc.exitValue())
    }
    if (code.isEmpty) {
      proc.destroy()
      fail(s"python binding script timed out after 5 minutes:\n" +
        out.synchronized(out.toString.takeRight(4000)))
    }
    assert(
      code.contains(0) &&
        out.synchronized(out.toString).contains("PYTHON BINDING CHECKS GREEN"),
      s"python binding script failed (exit ${code.get}):\n" +
        out.synchronized(out.toString.takeRight(4000)))
  }
}
