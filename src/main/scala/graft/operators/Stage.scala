package graft.operators

import org.apache.spark.sql.DataFrame

/** Pipeline-stage utilities for composing the operator family into
  * end-to-end jobs (see [[graft.examples.DailyCrawlExample]]).
  */
object Stage {

  /** Mark a reuse boundary: a DataFrame that feeds SEVERAL downstream
    * branches (e.g. a dedup survivor set consumed by both a
    * decontamination join and the final keep-filter) materializes once
    * and the branches share the result, instead of re-running the whole
    * upstream chain per branch — on a 100 TB pipeline an upstream that
    * includes a dedup join is hours per recompute.
    *
    * Same scheme as the internal dedup checkpoints ([[Dedup.shared]]):
    * LAZY `localCheckpoint` — nothing runs until the first real action,
    * there is no CacheManager entry to leak, and the ContextCleaner
    * reclaims the blocks when the result is dropped. A STREAMING input
    * passes through unchanged (an unbounded plan cannot checkpoint;
    * branches then recompute per micro-batch — the only valid
    * semantics). Executor loss invalidates the blocks — on a long-lived
    * production cluster prefer `checkpoint()` with a reliable directory
    * for multi-hour jobs. */
  def reuse(df: DataFrame): DataFrame = Dedup.shared(df, materialize = true)
}
