package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.mr.{MapReduceJob, TabCodec}

/** End-to-end reference-shaped job: text shards in → MR wordcount →
  * tab-separated partitioned output with _SUCCESS — the full O1→O10
  * dataflow of SURVEY.md §3.1 on Spark. */
class TextIOSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("text shards -> mr wordcount -> tabbed sink round-trips") {
    val tmp = Files.createTempDirectory("graft_textio").toString
    val in = s"$tmp/input"
    Files.createDirectories(Paths.get(in))
    Files.writeString(Paths.get(s"$in/input-001.txt"), "a b a\nc a\n")
    Files.writeString(Paths.get(s"$in/input-002.txt"), "b a!\n")

    val lines = TextIO.readLines(spark, in, shardMb = 1)
    val out = MapReduceJob(MapReduceJob.tokenizeMap, MapReduceJob.sumLongs).run(lines)
    TextIO.writeTabbed(out, s"$tmp/result")

    assert(Files.exists(Paths.get(s"$tmp/result/_SUCCESS")), "_SUCCESS marker")
    val got = TextIO.readLines(spark, s"$tmp/result")
      .collect().flatMap(TabCodec.decode).toMap
    assert(got === Map("a" -> "4", "b" -> "2", "c" -> "1"))
  }
}
