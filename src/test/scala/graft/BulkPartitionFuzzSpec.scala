package graft

import java.nio.file.Files

import scala.util.Random

import graft.sources.TxnTable

/** Seeded fuzz for the round-12 BULK partition staging path: random
  * sequences of `overwritePartitions` batches — value sets drawn from a
  * pool that includes Hive-escape-hostile strings (spaces, ':', '=',
  * '%', unicode) — driven against an in-JVM model `Map[value ->
  * row multiset]`. After every commit the full read, each partition
  * read, the manifest `parts`/`nrows` maps, and a time-travel read of
  * the previous version are checked. This is the mechanical guard for
  * the write/read value-rendering contract the one-job rewrite
  * introduced (dir names carry ESCAPED values, `.part` sidecars and
  * reads the raw ones): any escape/unescape drift or count mismatch
  * becomes a multiset diff with a replayable seed.
  */
class BulkPartitionFuzzSpec extends SparkTestBase {

  import spark.implicits._

  private val pool = Vector(
    "plain", "a b", "x:y", "k=v", "p%q", "uni-é", "dot.ted", "UPPER",
    "tab_less", "0", "-1", "with-dash")

  test("seeded bulk partition-overwrite sequences match the model " +
      "(values, counts, partition reads, time travel)") {
    val seeds = sys.env.getOrElse("SPARK_GRAFT_FUZZ_BULK", "20").toInt
    (1 to seeds).foreach(runSeed(_, inPlace = false))
  }

  test("the same sequences under IN-PLACE data publication (round 14): no " +
      "leaf renames — manifests reference nested staged paths; same model") {
    val seeds = sys.env.getOrElse("SPARK_GRAFT_FUZZ_BULK_INPLACE", "12").toInt
    (500 to 500 + seeds).foreach(runSeed(_, inPlace = true))
  }

  private def runSeed(seed: Int, inPlace: Boolean): Unit = {
      val rnd = new Random(seed)
      val dir = Files.createTempDirectory(s"graft-bulkfuzz-$seed").toString
      if (inPlace) TxnTable.installInPlaceData(dir)
      try runSeedOn(seed, rnd, dir, inPlace)
      finally { if (inPlace) TxnTable.uninstallInPlaceData(dir) }
  }

  private def runSeedOn(seed: Int, rnd: Random, dir: String,
                        inPlace: Boolean): Unit = {
      var model = Map.empty[String, Seq[(Long, String)]]
      var prevModel = model
      val steps = 2 + rnd.nextInt(3)
      (0 until steps).foreach { step =>
        val values = rnd.shuffle(pool).take(1 + rnd.nextInt(4))
        val rows = values.flatMap { v =>
          (0 until (1 + rnd.nextInt(5))).map(i =>
            ((rnd.nextLong() & Long.MaxValue) % 1000000L, v, s"d$step-$i"))
        }
        prevModel = model
        TxnTable.overwritePartitions(spark, dir,
          rows.toDF("id", "part", "payload"), "part")
        model = model -- values.map(identity) ++
          rows.groupBy(_._2).map { case (v, rs) =>
            v -> rs.map(r => (r._1, r._3)).sorted.toSeq
          }
        val clue = s"seed=$seed step=$step values=$values"
        // full read ≡ model
        val got = TxnTable.read(spark, dir).collect()
          .map(r => (r.getString(1), (r.getLong(0), r.getString(2)))).toSeq
          .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).sorted.toSeq }
        assert(got == model, s"$clue: full read diverged from the model")
        // manifest metadata: parts cover exactly the model's values,
        // nrows sum to the model's row count
        val snap = TxnTable.snapshot(dir, TxnTable.latestVersion(dir).get)
        assert(snap.parts.values.map(_._2).toSet == model.keySet,
          s"$clue: manifest parts drifted: ${snap.parts.values.toSet}")
        assert(snap.live.forall(snap.nrows.contains) &&
          snap.nrows.filter(kv => snap.live.contains(kv._1)).values.sum ==
            model.values.map(_.size.toLong).sum,
          s"$clue: manifest nrows drifted")
        // each partition read sees exactly its value's rows
        model.keys.foreach { v =>
          val pr = TxnTable.readPartition(spark, dir, "part", v).collect()
            .map(r => (r.getLong(0), r.getString(2))).sorted.toSeq
          assert(pr == model(v), s"$clue: partition read of '$v' diverged")
        }
        // time travel: the previous version still reads as prevModel
        if (step > 0) {
          val pv = TxnTable.latestVersion(dir).get - 1
          val tt = TxnTable.read(spark, dir, Some(pv)).collect()
            .map(r => (r.getString(1), (r.getLong(0), r.getString(2)))).toSeq
            .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).sorted.toSeq }
          assert(tt == prevModel, s"$clue: time travel to v$pv diverged")
        }
        // in-place mode: every bulk-staged dir is a NESTED reference —
        // nothing was renamed into a flat data/txn-* name
        if (inPlace)
          assert(snap.live.forall(_.contains("/")),
            s"$clue: in-place mode renamed a leaf: ${snap.live}")
      }
  }
}
