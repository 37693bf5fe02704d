package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.EntityResolution
import org.apache.spark.sql.functions._

/** Streaming ER gate: per-epoch convergence to the full batch resolve,
  * cross-batch bridges, replay idempotence, and compaction. */
class ErIngestSpec extends SparkSpec {
  import spark.implicits._

  // Long templated names so 1-edit variants clear the 0.9 trigram bar
  // (the EntityResolutionSpec bridge-fixture arithmetic). base2+"1" vs
  // base2+"2": 24 distinct trigrams each, 23 shared, union 25 -> 0.92.
  private val base = "alphabravocharlie"
  private val base2 = "zuluyankeexraywhiskeyecho"

  private def assignments(path: String): Map[Long, Long] =
    ErIngest.currentAssignments(spark, path)
      .select("record_id", "entity_id").as[(Long, Long)].collect().toMap

  private def fullResolve(recs: Seq[(Long, String)]): Map[Long, Long] =
    EntityResolution.resolve(recs.toDF("id", "name"), col("id"), col("name"),
        k = 1, tau = 0.9)
      .select("record_id", "entity_id").as[(Long, Long)].collect().toMap

  test("per-epoch convergence, cross-batch bridge, replay, compaction") {
    val idx = Files.createTempDirectory("eri_idx").toString + "/idx"
    val asg = Files.createTempDirectory("eri_asg").toString + "/asg"

    // batch 1: entity {1, 2} ("X"+base) and singleton 7 (unrelated)
    val b1 = Seq((1L, "X" + base), (2L, "X" + base), (7L, base2 + "1"))
    // batch 2: entity {10, 11} (base+"Y") — separate from {1, 2}
    val b2 = Seq((10L, base + "Y"), (11L, base + "Y"))
    // batch 3: record 5 = base bridges the two entities ACROSS batches
    val b3 = Seq((5L, base))

    ErIngest.processErBatch(b1.toDF("record_id", "name"), idx, asg, 1L)
    assert(assignments(asg) === fullResolve(b1), "epoch 1")

    ErIngest.processErBatch(b2.toDF("record_id", "name"), idx, asg, 2L)
    val after2 = assignments(asg)
    assert(after2 === fullResolve(b1 ++ b2), "epoch 2")
    assert(after2(10L) === 10L, "entities still separate before the bridge")

    ErIngest.processErBatch(b3.toDF("record_id", "name"), idx, asg, 3L)
    val after3 = assignments(asg)
    assert(after3 === fullResolve(b1 ++ b2 ++ b3), "epoch 3")
    assert(after3(10L) === 1L && after3(5L) === 1L && after3(11L) === 1L,
      s"cross-batch bridge must merge to the global min: $after3")
    assert(after3(7L) === 7L, "unrelated singleton untouched")

    // at-least-once replay: epoch 3 reruns with the same batch id and
    // must leave the state identical (partitions overwritten, probe
    // excluded its own partition)
    ErIngest.processErBatch(b3.toDF("record_id", "name"), idx, asg, 3L)
    assert(assignments(asg) === after3, "replayed epoch diverged")

    // compaction folds the edge log to canonical labels
    ErIngest.compactAssignments(spark, asg, 4L)
    assert(assignments(asg) === after3, "compaction changed the answer")
    val stored = spark.read.parquet(asg)
    assert(stored.select("batch_id").distinct().count() === 1L,
      "compaction must fold to a single base partition")
    // post-compaction the stored labels ARE canonical (no merge rows)
    val direct = stored.filter(col("name").isNotNull)
      .select("record_id", "entity_id").as[(Long, Long)].collect().toMap
    assert(direct === after3, "stored labels not canonical after fold")
    // replayed compaction is a no-op
    ErIngest.compactAssignments(spark, asg, 4L)
    assert(assignments(asg) === after3)

    // a later epoch probes the compacted base correctly
    ErIngest.processErBatch(Seq((20L, base2 + "2")).toDF("record_id", "name"),
      idx, asg, 5L)
    val after5 = assignments(asg)
    assert(after5 === fullResolve(b1 ++ b2 ++ b3 ++ Seq((20L, base2 + "2"))),
      "epoch after compaction")
    assert(after5(20L) === 7L, "new record must match the standing singleton")
  }

  test("an empty batch writes nothing and breaks nothing") {
    val idx = Files.createTempDirectory("eri_idx2").toString + "/idx"
    val asg = Files.createTempDirectory("eri_asg2").toString + "/asg"
    ErIngest.processErBatch(Seq.empty[(Long, String)].toDF("record_id", "name"),
      idx, asg, 1L)
    assert(assignments(asg).isEmpty)
    ErIngest.processErBatch(Seq((1L, base)).toDF("record_id", "name"), idx, asg, 2L)
    assert(assignments(asg) === Map(1L -> 1L))
  }
}
