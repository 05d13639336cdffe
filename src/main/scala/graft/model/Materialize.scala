package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Pipeline materialization point for iterative / self-joining plans
  * (ancestor-closure doubling, BFS level assembly, LSH signature reuse).
  *
  * Default: `localCheckpoint` — truncates lineage and is the fastest
  * option on local[32], but its blocks are UNREPLICATED: on a real
  * cluster an executor loss fails the query instead of recomputing.
  *
  * With `spark.graft.checkpoint.reliable=true` the same call becomes an
  * EAGER `persist(MEMORY_AND_DISK)`: lineage is kept (plan depth grows
  * with iteration count — bounded ≤64 at every call site) and a lost
  * block is recomputed from its parent instead of failing the job. Set
  * this before any cluster run; the two modes return identical data.
  */
object Materialize {
  def apply(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.getOption("spark.graft.checkpoint.reliable")
        .contains("true")) {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      p.count() // populate now: iterations must read the cache, not re-plan
      p
    } else df.localCheckpoint()
}
