package graft.mr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity tests for the GridMR-semantics MR library (SURVEY.md §5):
  * first-tab codec, silent-drop rules, R-invariance, and agreement
  * between the MR path and the declarative DataFrame path.
  */
class MapReduceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("TabCodec splits at FIRST tab only; value may contain tabs") {
    assert(TabCodec.decode("a\tb\tc") === Some(("a", "b\tc")))
    assert(TabCodec.decode("k\t") === Some(("k", "")))
    assert(TabCodec.decode("\tv") === Some(("", "v")))
  }

  test("TabCodec drops lines with no tab (mapper.cc:88)") {
    assert(TabCodec.decode("no tab here") === None)
    assert(TabCodec.decode("") === None)
  }

  test("stollPrefix matches std::stoll leading-parse semantics") {
    assert(MapReduceJob.stollPrefix("42") === Some(42L))
    assert(MapReduceJob.stollPrefix("  -7junk") === Some(-7L))
    assert(MapReduceJob.stollPrefix("+3") === Some(3L))
    assert(MapReduceJob.stollPrefix("x1") === None)
    assert(MapReduceJob.stollPrefix("") === None)
  }

  test("sumLongs drops non-numeric values (reduce.cc:15-18)") {
    val out = MapReduceJob.sumLongs("w", Iterator("1", "abc", "2", "3x")).toList
    assert(out === List(("w", "6"))) // 1 + 2 + 3 ("3x" parses as 3, "abc" dropped)
    assert(MapReduceJob.sumLongs("w", Iterator("abc")).toList === Nil)
  }

  test("MR wordcount equals declarative DataFrame wordcount") {
    import spark.implicits._
    val lines = Seq(
      "The quick brown fox; the quick dog!",
      "Dog dog DOG?",
      "tabs\tand spaces").toDS()
    val mr = MapReduceJob(MapReduceJob.tokenizeMap, MapReduceJob.sumLongs)
      .run(lines).collect().toMap
    val df = lines.toDF("text")
      .select(explode(split(lower(regexp_replace(col("text"), "[^a-zA-Z0-9]+", " ")), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1).toString).toMap
    assert(mr === df)
    assert(mr("dog") === "4")
  }

  test("result is invariant to the number of shuffle partitions (R)") {
    import spark.implicits._
    val lines = (1 to 500).map(i => s"word${i % 17} filler${i % 5}").toDS()
    val job = MapReduceJob(MapReduceJob.tokenizeMap, MapReduceJob.sumLongs)
    val base = job.run(lines).collect().toSet
    for (r <- Seq("1", "2", "13")) {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", r)
      try assert(job.run(lines).collect().toSet === base, s"R=$r")
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }

  test("map lines without a tab are dropped end-to-end") {
    import spark.implicits._
    val lines = Seq("a", "b", "a").toDS()
    // map emits one well-formed pair and one tab-less junk line,
    // decoded through the codec like runPipe does
    val job = MapReduceJob(
      map = l => TabCodec.decode(l + "\t1").iterator ++ TabCodec.decode("junk-no-tab").iterator,
      reduce = MapReduceJob.sumLongs)
    val out = job.run(lines).collect().toMap
    assert(out === Map("a" -> "2", "b" -> "1"))
  }

  test("runPipe: literal binary contract via stdin/stdout commands") {
    assume(new java.io.File("/bin/sh").exists())
    import spark.implicits._
    val lines = Seq("x y", "y z", "x x").toDS().repartition(2)
    // map: each token → "token<TAB>1"; reduce: awk sum-by-key
    val mapCmd = Seq("/bin/sh", "-c",
      """tr ' ' '\n' | sed -e 's/$/\t1/'""")
    val reduceCmd = Seq("/bin/sh", "-c",
      """awk -F'\t' '{s[$1]+=$2} END {for (k in s) print k"\t"s[k]}'""")
    val out = MapReduceJob.runPipe(lines, mapCmd, reduceCmd, nReducers = 3)
      .collect().flatMap(TabCodec.decode).toMap
    assert(out === Map("x" -> "3", "y" -> "2", "z" -> "1"))
  }
}
