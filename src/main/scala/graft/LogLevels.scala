package graft

/** Entry-point log hygiene. [[graft.ops.Clusters.release]] (used by the
  * connected-components rounds and the hierarchy traversal) unpersists
  * RDDs it localCheckpointed ITSELF, on purpose, after their last use —
  * but Spark logs every such unpersist as
  * `WARN MapPartitionsRDD: RDD n was locally checkpointed, its lineage
  * has been truncated and cannot be recomputed after unpersisting`, one
  * line per released round. Over a full bench run that is dozens of
  * lines of driver-tail noise that would bury a REAL warning.
  *
  * The silencing is deliberately done HERE, by the entry points (Bench,
  * Verify, the scale probes) and not inside the library: a host
  * application keeps its own logging policy — a library must not mutate
  * global logger levels as a side effect of an operator call.
  */
object LogLevels {

  /** Raise the intentional-release RDD logger to ERROR. Call after the
    * SparkSession exists (Spark's log4j2 config is installed by then).
    */
  def quietCheckpointRelease(): Unit = {
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)
    // same posture for `WARN WindowExec: No Partition Defined` — several
    // operators (shard-balance total, KS global cumulative, embed-drift
    // global sums) use an unpartitioned window over an ALREADY-AGGREGATED
    // bounded frame BY DESIGN (the alternative was a second corpus scan).
    // Tradeoff, stated plainly: the logger is per-class, so this silences
    // the warning for EVERY query in these entry-point sessions — an
    // accidental corpus-sized unpartitioned window would degrade without
    // its runtime warning here. The guards that remain are PlanShapeSpec
    // (every registry query) and the ingest no-SinglePartition pin; host
    // applications keep the warning because the library never calls this.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
  }
}
