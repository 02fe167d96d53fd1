package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-contract query: a Spark pipeline plus (when SQL-expressible) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet tables.
  *
  * Numeric discipline for oracle parity (hash compare): arithmetic in DECIMAL
  * (exact, partitioning-order independent), a single deterministic
  * decimal→double conversion at the end when a ratio is needed; column names
  * and types aligned on both sides.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)

  /** Deterministic scratch dir per (query, sfDir), wiped before each use so
    * reruns and idempotent-sink probes start from a known state. The ONE
    * definition — the wipe-before-use contract is load-bearing (q117's
    * versioned writes, q58's idempotent-sink probe), so catalogs must not
    * carry divergent copies.
    */
  /** Run `body` with a narrow shuffle width: streaming state stores (and
    * the per-micro-batch fold jobs of foreachBatch views) run one task
    * per shuffle partition per operator, and the demo streams carry
    * kilobytes of state — 32-wide shuffles are pure fixed overhead. A
    * production stream sizes this to its state volume. Restored after.
    */
  def withNarrowShuffle[A](s: SparkSession)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, "4")
    try body finally s.conf.set(key, prev)
  }

  /** Order-independent multiset equality by one-pass checksum — the cheap
    * form of the both-directions-empty exceptAll pair. Each side
    * is reduced in a single job (full scan, partial-aggregated count +
    * bit_xor + overflow-proof decimal sum over TWO independent row hashes:
    * xxhash64 and murmur3) with NO shuffle and NO join, where the
    * exceptAll pair costs four scans and two wide shuffles. Two
    * independent 64/32-bit hash families make a colliding multiset
    * difference cryptographically implausible; Spark's hash expressions
    * already normalize -0.0/NaN the same way its set operators do.
    * Used by the catalog's in-query equivalence audits, where the audit
    * used to cost more than the streams it audited (q269: 5.2 s of an
    * 8.2 s query).
    *
    * Guarantee class: CHECKSUM equivalence, not bit-exact set equality —
    * a colliding multiset difference needs simultaneous collisions in
    * both hash families' count+xor+sum triples (implausible, never
    * impossible). Call-site messages say "checksum-exactly" for this
    * reason; audits that still need the certain form use the
    * two-directions-empty `exceptAll` pair and pay its four scans.
    */
  def sameMultiset(a: DataFrame, b: DataFrame): Boolean = {
    import org.apache.spark.sql.functions._
    require(a.columns.sorted.sameElements(b.columns.sorted),
      s"sameMultiset: column sets differ: ${a.columns.toSeq} vs ${b.columns.toSeq}")
    def sig(df: DataFrame): org.apache.spark.sql.Row = {
      // each column contributes its NULL FLAG alongside its value: Spark's
      // hash expressions skip null children (the fold seed passes through
      // untouched), so without the flags hash(v, null) == hash(null, v)
      // for two same-typed columns and a value/null swap would collide on
      // BOTH hash families. The always-non-null boolean pins every
      // position into the fold.
      val cs = df.columns.sorted.toIndexedSeq
        .flatMap(c => Seq(col(c).isNull, col(c)))
      df.select(xxhash64(cs: _*).as("h64"), hash(cs: _*).cast("long").as("h32"))
        .agg(count(lit(1)).as("n"),
          expr("bit_xor(h64)").as("x64"),
          sum(col("h64").cast("decimal(38,0)")).as("s64"),
          expr("bit_xor(h32)").as("x32"),
          sum(col("h32").cast("decimal(38,0)")).as("s32"))
        .head()
    }
    sig(a) == sig(b)
  }

  def scratch(s: SparkSession, sfDir: String, name: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    // keyed by PID too: two JVMs on the same SF (Bench alongside Verify)
    // must not wipe each other's in-flight streaming inputs mid-query
    val pid = java.lang.ProcessHandle.current().pid()
    val path = s"${sys.props("java.io.tmpdir")}/graft_q/p$pid/${name}_$digest"
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    path
  }
}
