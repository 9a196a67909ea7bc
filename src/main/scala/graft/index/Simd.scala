package graft.index

/** Runtime gate for the JDK Vector API kernels ([[VectorKernels]]).
  *
  * `jdk.incubator.vector` is an incubator module: present only when the
  * JVM was launched with `--add-modules=jdk.incubator.vector` (build.sbt
  * adds it to every forked run/test JVM; a bare `spark-submit` without
  * the flag simply doesn't have it). The probe runs the kernel self-test
  * inside a catch-all, so linkage errors (missing module, future JDKs
  * renaming the API) degrade to the scalar loops — the kernels are an
  * acceleration layer, never a correctness dependency, and every spec
  * exercises both paths via [[forceScalar]].
  */
object Simd {
  /** Test seam: set BEFORE first use to pin the scalar paths. */
  @volatile var forceScalar: Boolean = false

  private lazy val available: Boolean =
    try VectorKernels.selfTest()
    catch { case _: Throwable => false } // no module / no SIMD → scalar

  def on: Boolean = !forceScalar && available
}
