package graft

/** Every SparkEntry query must be run-to-run deterministic — the
  * driver gate hashes collected values, so a nondeterministic ordering
  * or a time-dependent column would flake the gate even with correct
  * semantics. Runs each query twice on sf0.001 and compares the full
  * collected output. */
class QueryDeterminismSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name is run-to-run deterministic") {
      def run(): Seq[Seq[String]] =
        fn(spark, dir).collect().toSeq
          .map(_.toSeq.map(String.valueOf))
      assert(run() == run(), s"$name produced differing results")
    }
  }
}
