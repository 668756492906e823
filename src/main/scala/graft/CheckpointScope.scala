package graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Explicit lifecycle for PER-INVOCATION `localCheckpoint` frames
  * (optimization guide §5: unpersist when done).
  *
  * Operators checkpoint bounded intermediates (candidate pair sets, probe
  * frontiers, k-means working sets) that the RETURNED lazy plan still
  * reads, so the operator can never free them itself — only the caller
  * knows when the consuming action has finished. Without this scope the
  * blocks were freed only when the ContextCleaner noticed the GC'd frames:
  * a long-lived session accumulated hundreds of dead block sets and the
  * storage-pool pressure inflated later queries 2-4.5x at identical plans
  * (measured r13, where the bench papered over it with `System.gc()`
  * between queries — a crutch a 100 TB serving session does not have).
  *
  * Protocol: operators register each per-invocation checkpointed frame via
  * [[scoped]]; the harness (Bench / Verify / a serving loop) calls
  * [[drain]] once the action consuming the returned frame completes.
  * Frames built under [[pinned]] (process-lifetime memos shared across
  * invocations, e.g. the funnel prep memo) are never registered and
  * survive drains.
  *
  * Registrations hold the checkpointed RDD WEAKLY: a harness that never
  * drains (tests, ad-hoc consumers) keeps exactly the pre-scope behavior —
  * frame GC'd, ContextCleaner frees the blocks — instead of a strong-ref
  * leak in the queue.
  */
object CheckpointScope {
  private val live =
    new java.util.concurrent.ConcurrentLinkedQueue[java.lang.ref.WeakReference[RDD[_]]]()
  private val pinDepth = new ThreadLocal[Int] { override def initialValue: Int = 0 }

  /** Register a just-`localCheckpoint`ed per-invocation frame; returns it
    * unchanged. A non-checkpoint frame is a no-op.
    */
  def scoped[T](ds: Dataset[T]): Dataset[T] = {
    if (pinDepth.get == 0) {
      ds.queryExecution.logical match {
        case l: LogicalRDD => live.add(new java.lang.ref.WeakReference(l.rdd)): Unit
        case _ => ()
      }
    }
    ds
  }

  /** Build a process-lifetime frame: checkpoints created inside `body` (on
    * this thread) are NOT scope-registered — a later drain must never free
    * blocks a memoized plan still reads.
    */
  def pinned[A](body: => A): A = {
    pinDepth.set(pinDepth.get + 1)
    try body finally pinDepth.set(pinDepth.get - 1)
  }

  /** Free the checkpoint blocks of every frame registered since the last
    * drain. Call ONLY between queries: after the action consuming the
    * current query's result, before the next query's plan is built. A
    * frame already GC'd is skipped (the ContextCleaner owns it).
    */
  def drain(): Unit = {
    graft.operators.Staging.quietCheckpointRelease
    var ref = live.poll()
    while (ref != null) {
      val rdd = ref.get()
      if (rdd != null) rdd.unpersist(blocking = false): Unit
      ref = live.poll()
    }
  }
}
