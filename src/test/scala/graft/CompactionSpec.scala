package graft

import org.scalatest.funsuite.AnyFunSuite

/** Compaction: a fragmented parquet directory is rewritten to the sized
  * file count with identical row values.
  */
class CompactionSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def parquetFiles(dir: String) =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))

  test("compact rewrites many small files to the sized count, values intact") {
    val src = Tables.orders(spark, SparkTestBase.sf)
    val fragDir = java.nio.file.Files.createTempDirectory("graft_frag").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/out"
    graft.core.Fs.deleteOnExit(fragDir); graft.core.Fs.deleteOnExit(outDir)
    src.repartition(40).write.mode("overwrite").parquet(fragDir)
    val fragged = parquetFiles(fragDir)
    assert(fragged.length == 40, s"expected 40 fragments, got ${fragged.length}")

    val totalBytes = fragged.map(_.length()).sum
    // Target a quarter of the footprint → exactly 4 output files.
    val k = graft.tools.Compact.compact(spark, fragDir, outDir,
      targetBytes = math.max(1L, totalBytes / 4))
    assert(k <= 5, s"sized count should be ~4, got $k")
    assert(parquetFiles(outDir).length == k)

    val before = spark.read.parquet(fragDir)
    val after = spark.read.parquet(outDir)
    assert(after.count() == before.count())
    assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty,
      "compaction changed row values")
  }

  test("compact refuses overlapping input/output (in-place and ancestor)") {
    val base = java.nio.file.Files.createTempDirectory("graft_guard").toString
    graft.core.Fs.deleteOnExit(base)
    intercept[IllegalArgumentException] {
      graft.tools.Compact.compact(spark, base, base)
    }
    intercept[IllegalArgumentException] {
      // Output is an ANCESTOR of the input: Overwrite would delete the
      // input subtree before the lazy read runs.
      graft.tools.Compact.compact(spark, s"$base/sub", base)
    }
    intercept[IllegalArgumentException] {
      graft.tools.Compact.compact(spark, base, s"$base/out")
    }
  }

  test("compact of an already-right-sized dir yields one file") {
    val src = Tables.nation(spark, SparkTestBase.sf)
    val inDir = java.nio.file.Files.createTempDirectory("graft_small").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_small_out").toString + "/out"
    graft.core.Fs.deleteOnExit(inDir); graft.core.Fs.deleteOnExit(outDir)
    src.coalesce(1).write.mode("overwrite").parquet(inDir)
    val k = graft.tools.Compact.compact(spark, inDir, outDir)
    assert(k == 1)
    assert(parquetFiles(outDir).length == 1)
  }
}
