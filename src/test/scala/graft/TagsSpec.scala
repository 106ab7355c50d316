package graft

import java.nio.file.Files

import graft.sources.TxnTable

/** Round-15 named refs (Iceberg tags): immutable `_log/_refs/<name>`
  * pointers to committed versions that PIN retention — vacuum keeps a
  * tagged version's manifest chain and data dirs no matter how the
  * newest-N window moves, and reads resolve tags wherever a version is
  * accepted (`VERSION AS OF '<name>'`, the versionAsOf option,
  * [[TxnTable.resolveTag]]). Dropping the tag releases the pin.
  */
class TagsSpec extends SparkTestBase {

  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-tags").toString

  private def ids(dir: String, v: Option[Long] = None): Seq[Int] =
    TxnTable.read(spark, dir, v).collect().map(_.getInt(0)).sorted.toSeq

  test("create/list/resolve/drop; tags are immutable; bad targets refuse") {
    val dir = tmp()
    TxnTable.append(Seq((1, "a")).toDF("id", "v"), dir) // v0
    TxnTable.append(Seq((2, "b")).toDF("id", "v"), dir) // v1
    assert(TxnTable.createTag(dir, "first", Some(0L)) == 0L)
    assert(TxnTable.createTag(dir, "head") == 1L) // defaults to latest
    assert(TxnTable.listTags(dir) == Map("first" -> 0L, "head" -> 1L))
    assert(TxnTable.resolveTag(dir, "first").contains(0L))
    intercept[IllegalArgumentException] { // immutable
      TxnTable.createTag(dir, "first", Some(1L))
    }
    intercept[IllegalArgumentException] { // target must exist
      TxnTable.createTag(dir, "nope", Some(99L))
    }
    intercept[IllegalArgumentException] { // name charset
      TxnTable.createTag(dir, "../evil")
    }
    assert(TxnTable.deleteTag(dir, "head"))
    assert(!TxnTable.deleteTag(dir, "head")) // already gone
    assert(TxnTable.listTags(dir) == Map("first" -> 0L))
  }

  test("a tag PINS retention: vacuum keeps the tagged island's manifest " +
      "and data while reaping untagged middles; dropping the tag releases it") {
    val dir = tmp()
    (0 until 5).foreach(i => // v0..v4, each its own data dir
      TxnTable.append(Seq((i, s"r$i")).toDF("id", "v"), dir))
    TxnTable.createTag(dir, "keepme", Some(1L))
    TxnTable.vacuum(dir, retain = 2) // window v3..v4 + tagged v1
    // the tagged island still reads, with its full content
    assert(ids(dir, Some(1L)) == Seq(0, 1), "tagged version lost content")
    // untagged below-window versions answer the TYPED error
    intercept[TxnTable.RetentionError] { ids(dir, Some(0L)) }
    intercept[TxnTable.RetentionError] { ids(dir, Some(2L)) }
    assert(ids(dir, Some(3L)) == (0 to 3) && ids(dir) == (0 to 4))
    // drop the tag: the next vacuum reaps the island
    TxnTable.deleteTag(dir, "keepme")
    TxnTable.vacuum(dir, retain = 2)
    intercept[Exception] { ids(dir, Some(1L)) }
    assert(ids(dir) == (0 to 4), "head content damaged by island reap")
  }

  test("tagged islands under INCREMENTAL manifests keep their chain and " +
      "checkpoint anchor across vacuum (cold reconstruction)") {
    val dir = tmp()
    TxnTable.installCkptThreshold(dir, 1) // force incremental manifests
    try {
      (0 until 14).foreach(i =>
        TxnTable.append(Seq((i, s"r$i")).toDF("id", "v").coalesce(1), dir))
      val tagV = 12L
      TxnTable.createTag(dir, "mid", Some(tagV))
      TxnTable.vacuum(dir, retain = 1) // window = v13 + tagged v12
      TxnTable.clearSnapshotCache()    // force COLD reconstruction
      assert(ids(dir, Some(tagV)) == (0 to 12),
        "tagged incremental version failed to reconstruct after vacuum")
      assert(ids(dir) == (0 to 13))
    } finally TxnTable.uninstallCkptThreshold(dir)
  }

  test("reads resolve tags: the versionAsOf option and SQL VERSION AS OF " +
      "accept tag names; SQL verbs create/show/drop tags") {
    import graft.plans.GraftSql
    graft.plans.GraftDml.install(spark) // registers the graft path catalog
    val dir = tmp()
    TxnTable.append(Seq((1, "a")).toDF("id", "v"), dir)  // v0
    TxnTable.append(Seq((2, "b")).toDF("id", "v"), dir)  // v1
    val r = GraftSql.sql(spark,
      s"ALTER TABLE graft.`$dir` CREATE TAG rel_1 AS OF VERSION 0").head()
    assert(r.getString(0) == "rel_1" && r.getLong(1) == 0L)
    // reader option
    assert(spark.read.format("graft").option("versionAsOf", "rel_1")
      .load(dir).count() == 1L)
    // SQL time travel by tag through the path catalog
    assert(spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 'rel_1'")
      .count() == 1L)
    // and by number, unchanged
    assert(spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 1")
      .count() == 2L)
    val shown = GraftSql.sql(spark, s"SHOW TAGS graft.`$dir`")
      .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(shown == Seq(("rel_1", 0L)), s"SHOW TAGS wrong: $shown")
    // unknown ref: a reasoned error naming the tags
    val e = intercept[Exception] {
      spark.read.format("graft").option("versionAsOf", "nope").load(dir).count()
    }
    def chain(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ chain(x.getCause)
    assert(chain(e).exists(m => m.contains("nope") && m.contains("rel_1")),
      s"unknown-tag error unhelpful: ${chain(e)}")
    assert(GraftSql.sql(spark, s"ALTER TABLE graft.`$dir` DROP TAG rel_1")
      .head().getBoolean(1))
    assert(TxnTable.listTags(dir).isEmpty)
  }
}
