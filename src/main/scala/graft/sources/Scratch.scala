package graft.sources

import java.nio.file.{Files, Path, Paths}

/** RAM-backed scratch space for engine-internal staging.
  *
  * The streaming twins and the wire-format operators stage small
  * intermediate files (per-micro-batch parquet, stream checkpoints,
  * rolled frame blobs) whose lifetime is one operator call. On this
  * box `/tmp` sits on the root disk, so every micro-batch pays real
  * fsyncs for offsets/commits/state deltas that are deleted seconds
  * later — measured at ~2× the whole staged-stream cost. `/dev/shm`
  * is tmpfs (RAM): same POSIX surface, no disk round-trip.
  *
  * Scale posture: this is driver-local scratch, never data-plane
  * output. On a real cluster the durable checkpoint/sink locations
  * are caller-provided paths on HDFS/S3 (see
  * [[graft.streaming.StreamRelay.startAppendRelay]] which takes them
  * as parameters); only the bench-gate staging that exists to
  * simulate an unbounded source in a bounded test belongs in RAM.
  * Falls back to `java.io.tmpdir` when tmpfs is absent (e.g. a
  * stripped container), so nothing here is load-bearing for
  * correctness. Override with GRAFT_SCRATCH_DIR.
  */
object Scratch {
  val root: Path = {
    val want = sys.env.get("GRAFT_SCRATCH_DIR").map(Paths.get(_))
      .getOrElse(Paths.get("/dev/shm"))
    if (Files.isDirectory(want) && Files.isWritable(want)) want
    else Paths.get(System.getProperty("java.io.tmpdir"))
  }

  /** Fresh temp directory under the RAM root. Caller owns deletion. */
  def tempDir(prefix: String): Path = Files.createTempDirectory(root, prefix)
}
