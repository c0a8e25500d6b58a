package graft

/** Registry parity gate — the JVM half of `tools/gate.py` (VERDICT
  * r12 item 2: make the per-operator gate sequence unskippable at
  * commit time). Touches only the registry maps (no SparkSession),
  * so it runs in seconds: every `SparkEntry.queries` entry must have
  * a `SparkEntry.oracleSql` entry and vice versa — the exact
  * invariant whose one violation (`pca_power`, r12) slipped through
  * as `err: no_oracle` in the driver sweep. Prints one
  * machine-readable line; exit 1 on any mismatch. */
object Gate {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val missing = (q -- o).toSeq.sorted // registered, no oracle
    val extra = (o -- q).toSeq.sorted   // oracle for nothing
    println(s"GATE queries=${q.size} oracles=${o.size}" +
      s" missing=${missing.mkString("[", ",", "]")}" +
      s" extra=${extra.mkString("[", ",", "]")}")
    if (missing.nonEmpty || extra.nonEmpty) sys.exit(1)
  }
}
