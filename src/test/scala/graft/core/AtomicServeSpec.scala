package graft.core

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

/** Reader-vs-rewrite atomicity ([[SnapshotStore]]) — the one failure mode
  * the reference's row-atomic Cassandra writes never had (VERDICT r9 #1):
  * a `views`/`render` read racing a dirty-day rewrite must never see a
  * missing or partial day. The racing test here drives the publish/read
  * protocol from concurrent threads hard enough that the OLD dynamic
  * partition overwrite reproducibly tears (measured in docs/SCALE.md); the
  * snapshot protocol must survive the same schedule with zero anomalies. */
class AtomicServeSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val Day0 = 1704067200000L

  private def gen(n: Int, value: Double): DataFrame =
    (0 until n).map(i => ("t", s"m$i", Day0 + i * 1000L, value))
      .toDF("tenant_id", "metric_name", "ts_ms", "value")
      .withColumn("ts_day", lit(Day0))

  test("publish/read: per-day swap, previous-generation retention, " +
    "replaceAll, plain-table fallback and migration, mixed-layout guard") {
    val root = Files.createTempDirectory("graft_snap").toString + "/t"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def gens(day: Long): Set[String] = {
      val d = new org.apache.hadoop.fs.Path(s"$root/ts_day=$day")
      if (!fs.exists(d)) Set.empty
      else fs.listStatus(d).map(_.getPath.getName).filter(_.startsWith("gen=")).toSet
    }
    // absent table reads as None
    assert(SnapshotStore.read(spark, root).isEmpty)
    // first publish lands at gen=0 and serves exactly its rows
    SnapshotStore.publish(gen(5, 1.0), root)
    assert(gens(Day0) === Set("gen=0"))
    val r1 = SnapshotStore.read(spark, root).get
    assert(!r1.columns.contains("gen"), "gen must never escape the reader")
    assert(r1.count() === 5 &&
      r1.select("value").distinct().as[Double].collect().toSeq === Seq(1.0))
    // second publish swaps the winner, RETAINS the previous generation
    SnapshotStore.publish(gen(5, 2.0), root)
    assert(gens(Day0) === Set("gen=0", "gen=1"))
    assert(SnapshotStore.read(spark, root).get
      .select("value").distinct().as[Double].collect().toSeq === Seq(2.0))
    // third publish GCs gen=0 (keep winner + one previous)
    SnapshotStore.publish(gen(5, 3.0), root)
    assert(gens(Day0) === Set("gen=1", "gen=2"))
    // dirty-day semantics: publishing another day leaves day0 untouched
    val day1 = Day0 + 86400000L
    SnapshotStore.publish(gen(3, 9.0).withColumn("ts_day", lit(day1)), root)
    assert(SnapshotStore.read(spark, root).get.count() === 8)
    // replaceAll drops days absent from the new data (full-rebuild)
    SnapshotStore.publish(gen(4, 5.0), root, replaceAll = true)
    assert(gens(day1).isEmpty && !fs.exists(
      new org.apache.hadoop.fs.Path(s"$root/ts_day=$day1")))
    assert(SnapshotStore.read(spark, root).get.count() === 4)
    // leaked staging from a "crash" is INVISIBLE to readers (a crashed
    // publish that wrote data but never committed a rename serves
    // nothing) and is cleared by the next publish
    val dead = new org.apache.hadoop.fs.Path(s"$root/.staging-dead")
    fs.mkdirs(dead)
    gen(9, 99.0).drop("ts_day")
      .write.parquet(s"$root/.staging-dead/ts_day=$Day0")
    assert(SnapshotStore.read(spark, root).get
      .filter(col("value") === 99.0).count() === 0,
      "uncommitted staging data must never serve")
    SnapshotStore.publish(gen(4, 6.0), root)
    assert(!fs.exists(dead))

    // plain-table fallback: a store never published through the protocol
    // reads through ordinary discovery
    val plain = Files.createTempDirectory("graft_snap_plain").toString + "/t"
    gen(3, 7.0).write.partitionBy("ts_day").parquet(plain)
    assert(SnapshotStore.read(spark, plain).get.count() === 3)
    // ... and the first publish MIGRATES it (plain day wrapped to gen=0,
    // new day committed as its own generation)
    SnapshotStore.publish(
      gen(2, 8.0).withColumn("ts_day", lit(day1)), plain)
    val migrated = SnapshotStore.read(spark, plain).get
    assert(migrated.count() === 5)
    assert(migrated.filter(col("ts_day") === Day0)
      .select("value").distinct().as[Double].collect().toSeq === Seq(7.0))
    // a HAND-MADE mixed layout (one day plain, one gen'd) fails loud
    val mixed = Files.createTempDirectory("graft_snap_mixed").toString + "/t"
    gen(2, 1.0).write.partitionBy("ts_day").parquet(mixed)
    gen(2, 2.0).withColumn("ts_day", lit(day1)).drop("ts_day")
      .write.parquet(s"$mixed/ts_day=$day1/gen=0")
    intercept[IllegalArgumentException](SnapshotStore.read(spark, mixed))
    // ... but an EMPTY day dir (crash between publish's mkdirs and its
    // commit rename) is not data: neither a mixed-layout failure nor a
    // served day
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/ts_day=${day1 + 86400000L}"))
    assert(SnapshotStore.read(spark, root).get.count() === 4)
  }

  test("RACE: concurrent publishes never serve a reader a torn day — " +
    "every racing read sees one complete generation") {
    val root = Files.createTempDirectory("graft_snap_race").toString + "/t"
    val N = 400
    val Gens = 7
    SnapshotStore.publish(gen(N, 0.0), root)
    val stop = new AtomicBoolean(false)
    val anomalies = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val reads = new AtomicInteger(0)
    val perReader = Array.fill(2)(new AtomicInteger(0))
    val readers = (0 until 2).map { ri =>
      new Thread(() => {
        while (!stop.get()) {
          try {
            val rows = SnapshotStore.read(spark, root).get
              .groupBy(col("value")).agg(count(lit(1)).as("n"))
              .collect()
            reads.incrementAndGet()
            perReader(ri).incrementAndGet()
            // torn day = rows of MORE than one generation value, or a
            // generation served with missing/duplicated rows
            if (rows.length != 1)
              anomalies.add(s"mixed generations: ${rows.mkString(",")}")
            else if (rows(0).getLong(1) != N)
              anomalies.add(s"partial day: ${rows(0)}")
          } catch {
            case e: Throwable => anomalies.add(s"read failed: $e")
          }
        }
      })
    }
    readers.foreach(_.start())
    // publisher: each generation rewrites the SAME day with a new value.
    // Retention keeps one previous generation, so a reader that resolved
    // just before a swap still reads intact files — the guarantee under
    // test. The contract covers ONE publish per in-flight read (a second
    // publish GCs the generation a still-running read resolved — the
    // documented LOUD failure), so the publisher paces on reader
    // progress: after each publish it waits until both readers completed
    // a read, which keeps every publish racing in-flight reads without
    // ever outrunning one by two generations (under full-suite box load
    // a single read can outlast two unpaced publishes — observed).
    (1 to Gens).foreach { g =>
      val before = perReader.map(_.get())
      SnapshotStore.publish(gen(N, g.toDouble), root)
      // EACH reader must complete a read after this publish returned —
      // its next read then resolves the new winner, so no read in flight
      // at the NEXT publish can still hold a generation that publish GCs
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (perReader.zip(before).exists { case (c, b) => c.get() <= b } &&
        System.nanoTime() < deadline)
        Thread.sleep(20)
    }
    stop.set(true)
    readers.foreach(_.join(60000))
    assert(reads.get() >= 3, s"race never overlapped (reads=${reads.get()})")
    assert(anomalies.isEmpty,
      s"${anomalies.size} torn/failed reads: ${anomalies.peek()}")
    // the final state serves the last generation exactly
    assert(SnapshotStore.read(spark, root).get
      .select("value").distinct().as[Double].collect().toSeq
      === Seq(Gens.toDouble))
  }
}
