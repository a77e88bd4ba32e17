package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** r17 watch item (b): the nine `q_tws_*` keys share one once-per-JVM
  * staged artifact (emissions parquet + RocksDB changelog checkpoint,
  * `StreamingOps.stagedTwsReplay`). The artifact is a pure function of
  * the CDC landing fixture — pid-scoped, deleted at JVM exit — so it
  * CANNOT accumulate across rounds; this spec turns that argument into
  * a pinned bound and prints the measured size, so a future change
  * that makes the checkpoint grow (more state vars, snapshot mode
  * replacing changelog mode, emission blowup) fails here instead of
  * surfacing as anchor drift. Runs at the SF the suite uses; the
  * sf0.1 size is recorded in SCALE.md. */
class TwsArtifactSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private def duBytes(f: java.io.File): Long =
    if (f.isDirectory) Option(f.listFiles()).map(_.map(duBytes).sum).getOrElse(0L)
    else f.length()

  test("staged tws artifact is bounded and measured") {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    // force the staging through a gate key's own path
    assert(graft.SparkEntry.queries("q_tws_state")(spark, dir).count() > 0)
    val base = new java.io.File(graft.queries.Scratch.dir("tws_multi", dir))
    assert(base.isDirectory, s"staged artifact missing at $base")
    val ck = duBytes(new java.io.File(base, "ck"))
    val em = duBytes(new java.io.File(base, "emissions"))
    info(f"tws_multi staged artifact: checkpoint ${ck / 1024}%d KiB, " +
      f"emissions ${em / 1024}%d KiB ($dir)")
    // generous ceiling: the r18 measurement is ~1-2 MB total at sf0.1;
    // an order-of-magnitude regression (snapshot-per-batch, state
    // blowup) blows straight through it
    assert(ck + em < 32L * 1024 * 1024,
      s"staged tws artifact grew to ${(ck + em) / 1024} KiB — investigate before it " +
        "reappears as q_tws_* anchor drift")
  }
}
