package graft
import org.apache.spark.sql.functions.{col, expr, to_json, xxhash64}

/** Benchmark main (driver contract): one JSON line with per-query seconds.
  *
  * Harness rules (VERDICT r1 #7):
  *  - deterministic (sorted) query order, so no query silently absorbs
  *    JIT/codegen warm-up for the others;
  *  - a full warm-up pass first, so timed numbers measure the plan, not
  *    first-touch class loading;
  *  - evaluation is forced with a hash-aggregate over EVERY output column —
  *    `.count()` would let Catalyst prune away the very expressions under
  *    test;
  *  - failures are surfaced (stderr + "errors" map + value -1), never
  *    swallowed into a fast-looking number.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = LocalSpark.session(cpus, "graft-bench")

    /** Run one query to completion, touching every output column. */
    def force(name: String): Option[String] =
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        // Map columns (at ANY nesting depth) aren't hashable by xxhash64 —
        // serialize such columns first (ADVICE r2), so a future map-returning
        // query is timed, not failed.
        def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = {
          import org.apache.spark.sql.types._
          dt match {
            case _: MapType      => true
            case a: ArrayType    => hasMap(a.elementType)
            case s: StructType   => s.fields.exists(f => hasMap(f.dataType))
            case _               => false
          }
        }
        val hashable = df.schema.fields.map { f =>
          if (hasMap(f.dataType)) to_json(col(f.name)) else col(f.name)
        }
        // bit_xor, not sum: a 60M-row sum of 64-bit hashes overflows under
        // ANSI mode; xor is order-insensitive and cannot overflow.
        df.select(xxhash64(hashable: _*).as("h"))
          .agg(expr("bit_xor(h)")).collect()
        None
      } catch { case e: Throwable =>
        Some(e.toString.replaceAll("\\s+", " ").take(300))
      }

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(force) // warm-up: classloading, codegen, parquet footers
    val timed = names.map { name =>
      val t0 = System.nanoTime()
      val err = force(name)
      val sec = (System.nanoTime() - t0) / 1e9
      err.foreach(m => System.err.println(s"[bench] $name FAILED: $m"))
      (name, if (err.isEmpty) sec else -1.0, err)
    }
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val qs = timed.map { case (k, v, _) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val errs = timed.collect { case (k, _, Some(m)) => s"${jstr(k)}:${jstr(m)}" }
      .mkString("{", ",", "}")
    val total = timed.collect { case (_, v, None) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
