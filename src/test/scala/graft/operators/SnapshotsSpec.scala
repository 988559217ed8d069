package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SnapshotsSpec extends SparkTestBase {

  import spark.implicits._

  test("diff classifies added, removed, changed and drops unchanged") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "text")
    val nw = Seq((2L, "b"), (3L, "c2"), (5L, "e")).toDF("id", "text")
    val got = Snapshots.diff(old, nw, "id", _ => col("text"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "removed"), (3L, "changed"), (4L, "removed"),
      (5L, "added")))
  }

  test("multi-column fingerprints compare the chosen columns only") {
    val old = Seq((1L, "a", "keep"), (2L, "b", "keep")).toDF("id", "t", "meta")
    val nw = Seq((1L, "a", "DIFFERENT"), (2L, "B", "keep"))
      .toDF("id", "t", "meta")
    // fingerprint only `t`: row 1 unchanged despite meta churn
    val got = Snapshots.diff(old, nw, "id", _ => col("t"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((2L, "changed")))
  }

  test("null payloads read as present-with-null-content, not missing keys") {
    val old = Seq((1L, null.asInstanceOf[String]), (2L, "b"),
      (3L, null.asInstanceOf[String])).toDF("id", "text")
    val nw = Seq((1L, "x"), (2L, "b"), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val got = Snapshots.diff(old, nw, "id", _ => col("text"))
      .as[(Long, String)].collect().toSet
    // 1: null -> "x" is changed (not added); 3: null -> null unchanged
    assert(got == Set((1L, "changed")))
  }
}
