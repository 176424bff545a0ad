package mallispark

import org.apache.spark.sql.{functions => F}
import mallispark.run.SnapshotTable

/** Snapshot-log table format: atomic commits, snapshot-isolated time
  * travel, append vs logical-replace, lineage, cross-snapshot diff. */
class SnapshotTableSpec extends SparkSuite {

  private def freshDir(): String = java.nio.file.Files
    .createTempDirectory("snaptab_spec_").toString

  test("commit/append: time travel reads each snapshot's own rows") {
    val dir = freshDir()
    val a = spark.range(10).select(F.col("id"), (F.col("id") * 2).as("v"))
    val b = spark.range(10, 15).select(F.col("id"), (F.col("id") * 2).as("v"))
    val s1 = SnapshotTable.commit(a, dir)
    val s2 = SnapshotTable.commit(b, dir) // append
    assert(s1 === 1L && s2 === 2L)
    assert(SnapshotTable.currentSnapshotId(dir) === Some(2L))
    // snapshot 1 is ISOLATED from commit 2
    assert(SnapshotTable.read(spark, dir, Some(s1)).count() === 10L)
    assert(SnapshotTable.read(spark, dir).count() === 15L)
    assert(SnapshotTable.read(spark, dir)
      .agg(F.sum("id")).collect()(0).getLong(0) === (0L until 15L).sum)
  }

  test("overwrite replaces logically; old snapshot stays readable") {
    val dir = freshDir()
    val s1 = SnapshotTable.commit(spark.range(8).toDF("id"), dir)
    val s2 = SnapshotTable.commit(spark.range(100, 103).toDF("id"), dir,
      SnapshotTable.Overwrite)
    assert(SnapshotTable.read(spark, dir, Some(s2))
      .collect().map(_.getLong(0)).sorted === Array(100L, 101L, 102L))
    assert(SnapshotTable.read(spark, dir, Some(s1)).count() === 8L)
  }

  test("lineage records parent/mode/rows per commit") {
    val dir = freshDir()
    SnapshotTable.commit(spark.range(6).toDF("id"), dir)
    SnapshotTable.commit(spark.range(6, 10).toDF("id"), dir)
    SnapshotTable.commit(spark.range(2).toDF("id"), dir,
      SnapshotTable.Overwrite)
    val rows = SnapshotTable.lineage(spark, dir)
      .orderBy("snapshot_id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(2), r.getLong(3),
      r.getLong(4))).toSeq ===
      Seq((1L, "append", 6L, 6L), (2L, "append", 4L, 10L),
        (3L, "overwrite", 2L, 2L)))
    assert(rows(0).isNullAt(1) && rows(1).getLong(1) === 1L)
  }

  test("diff on real snapshot ids classifies added/removed/modified") {
    val dir = freshDir()
    val prev = spark.range(10)
      .select(F.col("id"), F.concat(F.lit("t"), F.col("id")).as("text"))
    val s1 = SnapshotTable.commit(prev.where(F.col("id") =!= 4), dir)
    val curr = prev.where(F.col("id") =!= 7)
      .withColumn("text", F.when(F.col("id") === 2, F.lit("changed"))
        .otherwise(F.col("text")))
    val s2 = SnapshotTable.commit(curr, dir, SnapshotTable.Overwrite)
    val d = SnapshotTable.diff(spark, dir, s1, s2, "id", F.col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(4L -> "added", 7L -> "removed", 2L -> "modified"))
  }

  test("read of an empty table fails fast") {
    intercept[IllegalArgumentException] {
      SnapshotTable.read(spark, freshDir())
    }
  }
}
