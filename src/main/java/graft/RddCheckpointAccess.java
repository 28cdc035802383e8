package graft;

import org.apache.spark.rdd.RDD;

/**
 * Accessor for RDD.isLocallyCheckpointed, which is public in bytecode but
 * Scala-private in the signature: javac sees only the bytecode, so this
 * compiles where a Scala call site does not. Lets the bench/verify drivers
 * distinguish Materialize.frame's orphaned localCheckpoint blocks
 * (reclaimable between queries) from deliberately persisted SharedFrames
 * views (kept for cross-query reuse).
 */
public final class RddCheckpointAccess {
  private RddCheckpointAccess() {}

  public static boolean isLocallyCheckpointed(RDD<?> rdd) {
    return rdd.isLocallyCheckpointed();
  }
}
