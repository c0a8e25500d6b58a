package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-layout invariants of the Z-order writer that the row-set
  * oracle gate cannot see: per-file zval ranges must not interleave
  * (the bounding-box property that makes file pruning work on either
  * key) and rows must be zval-sorted inside each file. */
class LayoutSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("zorder layout: files cover non-overlapping zval ranges, sorted within") {
    val out = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_zorder_spec").toString
    Relational.writeZorderLayout(spark, dir, out)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.toString).sorted
    assert(files.length > 1, "expected a multi-file layout")
    // per-file (min, max, sortedness) read file-by-file, raw order
    val ranges = files.flatMap { f =>
      val rows = spark.read.parquet(f).select(col("zval"))
        .collect().map(_.getLong(0))
      assert(rows.sameElements(rows.sorted),
        s"$f is not zval-sorted within the file")
      // boundary sampling can leave a range partition empty — no
      // bounding box to check there
      if (rows.isEmpty) None else Some((rows.min, rows.max))
    }
    // equal keys are never split by a RangePartitioner, so ordering
    // files by min-zval must give strictly non-interleaving ranges
    ranges.sortBy(_._1).sliding(2).foreach {
      case Array((_, prevMax), (nextMin, _)) =>
        assert(prevMax <= nextMin,
          s"file ranges interleave: max $prevMax > next min $nextMin")
      case _ => ()
    }
    // every lineitem row survives the round trip exactly once
    val n = spark.read.parquet(out).count()
    assert(n === graft.sources.Tables.lineitem(spark, dir).count())
  }

  test("zorder layout actually SKIPS: a box predicate reads a corner, not the table") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // sf0.01: the box predicate keeps 90 of 60 000 rows (0.15%)
    val sfDir = "/root/testdata/sf0.01"
    val out = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_zorder_skip_spec").toString
    Relational.writeZorderLayout(spark, sfDir, out)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(files.length >= 8, "expected a multi-file layout")
    // footer-level proof: per-file key bounding boxes (what the
    // parquet min/max stats advertise) — only the low-corner files
    // may intersect the box predicate
    val hit = files.count { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("l_orderkey")), min(col("l_partkey"))).collect()(0)
      r.getLong(0) < Relational.SkipOrd && r.getLong(1) < Relational.SkipPart
    }
    assert(hit >= 1, "predicate must land somewhere")
    assert(hit <= files.length / 4,
      s"$hit of ${files.length} file boxes intersect the predicate — layout not clustering")
    // engine-level proof: the executed scan's output rows are the
    // surviving row groups only, a small fraction of the table
    val df = spark.read
      .schema("l_orderkey LONG, l_partkey LONG, l_linenumber INT, zval LONG, zbucket LONG")
      .parquet(out)
      .filter(col("l_orderkey") < Relational.SkipOrd &&
        col("l_partkey") < Relational.SkipPart)
    assert(df.count() === 90L)
    df.collect()
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other                    => other
    }
    val scan = unwrap(df.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec => s }.head
    val scanned = scan.metrics("numOutputRows").value
    val total = 60000L
    assert(scanned <= total / 4,
      s"scan decoded $scanned of $total rows — row-group skipping not engaged")
    info(s"scan decoded $scanned of $total rows; $hit of ${files.length} file boxes hit")
  }

  test("compact_files collapses the small-file layout to the target count") {
    Corpus.compactFiles(spark, dir).count() // materialize both writes
    val scratch = graft.sources.TempDirs.scratch("compact", dir)
    def partFiles(sub: String): Int =
      new java.io.File(s"$scratch/$sub").listFiles()
        .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(partFiles("small") == Corpus.CompactSmallFiles,
      "the before-state must actually be the small-files mess")
    assert(partFiles("compacted") == Corpus.CompactTargetFiles,
      "compaction must hit the target file count")
  }

  test("morton key is a true interleave: deinterleaving recovers both keys") {
    import org.apache.spark.sql.functions.col
    // reference inverse, built independently of the operator's
    // magic-number spread: collect even/odd bits
    def deinterleave(z: Long): (Long, Long) = {
      var x = 0L; var y = 0L
      (0 until 16).foreach { i =>
        x |= ((z >> (2 * i)) & 1L) << i
        y |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (x, y)
    }
    val rows = Relational.zorderCluster(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("zval"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (x, y) = deinterleave(r.getLong(2))
      assert(x === (r.getLong(0) & 65535L), s"orderkey bits lost in ${r.getLong(2)}")
      assert(y === (r.getLong(1) & 65535L), s"partkey bits lost in ${r.getLong(2)}")
    }
  }

  test("sink-gated queries are idempotent within one session") {
    // every sink gate reuses a fixed per-(input, JVM) scratch path in
    // overwrite mode (TempDirs) — a second invocation must reproduce
    // the identical result set, not append, clobber mid-read, or
    // double-drain. stream_sink additionally exercises its
    // checkpoint's zero-new-files path.
    Seq("zorder_write", "shuffle_export_write", "compact_files", "stream_sink",
      "stream_merge", "partition_overwrite", "stream_dedup")
      .foreach { name =>
        def run(): Set[String] =
          graft.SparkEntry.queries(name)(spark, dir)
            .collect().map(_.toString).toSet
        val first = run()
        val second = run()
        assert(first === second, s"$name not idempotent across invocations")
        assert(first.nonEmpty, s"$name returned nothing")
      }
  }

  test("dynamic partition overwrite rewrites ONLY the touched partitions") {
    // first call stages the day-partitioned base and applies the
    // trailing-week restatement
    graft.SparkEntry.queries("partition_overwrite")(spark, dir).count()
    val tbl = new java.io.File(
      graft.sources.TempDirs.scratch("partoverwrite", dir), "t")
    val dayDirs = tbl.listFiles().filter(f => f.isDirectory && f.getName.startsWith("day="))
    assert(dayDirs.length > 7, "fixture spans more than the restated week")
    def fileState(d: java.io.File): Set[(String, Long, Long)] =
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length, f.lastModified)).toSet
    val days = dayDirs.map(_.getName).sorted
    val untouched = days.dropRight(7).map(n => n -> fileState(new java.io.File(tbl, n))).toMap
    val touched = days.takeRight(7).map(n => n -> fileState(new java.io.File(tbl, n))).toMap
    Thread.sleep(1100) // mtime resolution guard
    // second call re-applies the restatement: trailing partitions are
    // rewritten (new files), older days must be byte-for-byte untouched
    graft.SparkEntry.queries("partition_overwrite")(spark, dir).count()
    days.dropRight(7).foreach { n =>
      assert(fileState(new java.io.File(tbl, n)) === untouched(n),
        s"partition $n was rewritten despite no correction touching it")
    }
    assert(days.takeRight(7).exists { n =>
      fileState(new java.io.File(tbl, n)) != touched(n)
    }, "no restated partition was actually rewritten")
  }
}
