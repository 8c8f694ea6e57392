package graft

import org.apache.spark.sql.SparkSession

/** Shuffle-I/O session tuning shared by the local mains (Bench / Verify /
  * tools.Profile). Guide §2.2: shuffle cost grows with the M×R block
  * count, not just bytes.
  *
  * Measured on this box (r19, jstack sampling of d03's pair stages): the
  * dominant task-time sink at width 32 was `FileOutputStream.open0` inside
  * `BypassMergeSortShuffleWriter` — the bypass writer opens one file PER
  * REDUCE PARTITION per map task (32×32 = 1,024 file creates per exchange,
  * several exchanges per query), so the cost scales quadratically with
  * core count while the data stays constant. That was the fleet-wide
  * 32-core-slower-than-8-core signature (PERF_r18 scaling <1 on the
  * shuffle-heavy rows): d03 task time 11 s → 4 s and warm wall
  * 0.85-1.2 → ~0.64 s from the two knobs below.
  *
  *  - `spark.shuffle.sort.bypassMergeThreshold=8`: shuffles wider than 8
  *    reduce partitions take the sort-based writer — ONE data file + index
  *    per map task regardless of R. This matches the path a real cluster
  *    runs anyway (default threshold 200 with production R in the
  *    thousands); only small-R local shuffles change, and the 8-wide
  *    driver low-core leg keeps its current bypass behavior.
  *  - `spark.local.dir=/dev/shm/...` (only when present and writable):
  *    shuffle blocks of a resident local engine belong in tmpfs/page
  *    cache, the assumption the bench session's
  *    `spark.shuffle.compress=false` already documents. Env-overridable;
  *    falls back to the JVM default (java.io.tmpdir) when /dev/shm is
  *    unavailable. Cluster deployments size real local disks instead.
  *    Capacity note: tmpfs shares RAM (128 GiB box, shuffle+spill bytes
  *    at these SFs are MBs); a run expected to shuffle beyond tmpfs
  *    headroom should set GRAFT_LOCAL_DIR to a disk path.
  */
object SessionTuning {
  def shuffleIo(b: SparkSession.Builder): SparkSession.Builder = {
    val withBypass = b.config("spark.shuffle.sort.bypassMergeThreshold",
      sys.env.getOrElse("GRAFT_BYPASS_THRESHOLD", "8"))
    val dir = sys.env.get("GRAFT_LOCAL_DIR").orElse {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) Some("/dev/shm/spark-graft-local")
      else None
    }
    dir.fold(withBypass)(d => withBypass.config("spark.local.dir", d))
  }
}
