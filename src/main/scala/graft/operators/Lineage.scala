package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.storage.StorageLevel

/** Explicitly-owned lineage truncation for iterative driver loops (BPE
  * training, connected-components contraction): materialize a frame into a
  * persisted RDD the CALLER owns and rebuild a DataFrame leaf over it.
  *
  * This both truncates the logical plan (k rounds stay k flat jobs instead
  * of one k-deep expression tree) AND hands back a handle that `unpersist()`
  * actually frees — `Dataset.localCheckpoint` pins its internal RDD outside
  * the CacheManager, so `Dataset.unpersist` on the result is a silent no-op
  * and a k-round loop would pin k generations of blocks until driver GC
  * happens to collect the superseded Datasets (r7 review finding; ADVICE r7
  * flagged the contraction loop for the same leak).
  */
private[graft] object Lineage {

  /** Eager form: the `count()` is what makes it safe to free the PREVIOUS
    * round's RDD immediately — once this one is computed, nothing reads it.
    */
  def materialize(df: DataFrame): (DataFrame, RDD[Row]) = {
    val (out, rdd) = materializeLazy(df)
    rdd.count()
    (out, rdd)
  }

  /** Lazy form for loops whose NEXT action (a convergence test, a sum) is
    * itself the materializer — keeps each round at ONE Spark job where the
    * eager form would run two. The caller must run that action before
    * unpersisting the previous round's RDD.
    */
  def materializeLazy(df: DataFrame): (DataFrame, RDD[Row]) = {
    val rdd = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    (df.sparkSession.createDataFrame(rdd, df.schema), rdd)
  }
}
