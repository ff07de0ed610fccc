package graft

import graft.model._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Config boot path: round-trip a translated reference config.yaml,
  * defaults, and the verify errors (config.go:96-121).
  */
class ConfigLoaderSpec extends AnyFunSuite {

  private val full =
    """instance_id: "7"
      |dst_root: /data/dst
      |multiple_instances_mode: true
      |max_expected_heartbeat_interval: 10
      |max_batch_size: 500
      |buckets: 32
      |standby_max_wait_millis: 1234
      |streams:
      |  - src_path: /data/src/events    # topic analog
      |    dst_table: users
      |    partitions: 8
      |    problem_strategy: continue
      |  - src_path: /data/src/orders
      |    dst_table: orders
      |    problem_strategy: stop
      |""".stripMargin

  test("full config round-trips into EngineConfig") {
    val cfg = ConfigLoader.parse(full)
    assert(cfg.instanceId == "7")
    assert(cfg.dstRoot == "/data/dst")
    assert(cfg.multipleInstancesMode)
    assert(cfg.maxExpectedHbIntervalMs == 10000L)
    assert(cfg.maxBatchSize == 500 && cfg.buckets == 32)
    assert(cfg.standbyMaxWaitMillis == 1234L)
    // each stream keeps its own strategy (per-stream dispatch)
    assert(cfg.streams == Seq(
      StreamConfig(0, "/data/src/events", "users", 8,
        Some(ProblemStrategy.Continue)),
      StreamConfig(1, "/data/src/orders", "orders", 1,
        Some(ProblemStrategy.Stop))))
  }

  test("load reads from a file") {
    val f = Files.createTempFile("graft-cfg", ".yaml")
    Files.writeString(f, full)
    assert(ConfigLoader.load(f.toString) == ConfigLoader.parse(full))
  }

  test("defaults: missing strategy = stop, partitions = 1, guard off") {
    val cfg = ConfigLoader.parse(
      """instance_id: a
        |dst_root: /d
        |streams:
        |  - src_path: /s
        |    dst_table: t
        |""".stripMargin)
    assert(cfg.streams.head.problemStrategy.contains(ProblemStrategy.Stop))
    assert(cfg.streams.head.partitions == 1)
    assert(cfg.maxExpectedHbIntervalMs == 0L)
    assert(!cfg.multipleInstancesMode)
  }

  test("mixed strategies survive the load unfused") {
    val cfg = ConfigLoader.parse(
      """instance_id: a
        |dst_root: /d
        |streams:
        |  - {src_path: /s1, dst_table: t1, problem_strategy: continue}
        |  - {src_path: /s2, dst_table: t2, problem_strategy: cmd_queue}
        |""".stripMargin)
    assert(cfg.streams.map(_.problemStrategy) == Seq(
      Some(ProblemStrategy.Continue), Some(ProblemStrategy.CmdQueue)))
  }

  test("unknown strategy / missing fields are hard errors") {
    intercept[IllegalArgumentException](ConfigLoader.parse(
      "instance_id: a\ndst_root: /d\nstreams:\n  - {src_path: /s, dst_table: t, problem_strategy: explode}\n"))
    intercept[IllegalArgumentException](ConfigLoader.parse("instance_id: a\ndst_root: /d\n"))
    intercept[IllegalArgumentException](ConfigLoader.parse("dst_root: /d\nstreams:\n  - {src_path: /s, dst_table: t}\n"))
    intercept[IllegalArgumentException](ConfigLoader.parse("instance_id: a\nstreams:\n  - {src_path: /s, dst_table: t}\n"))
  }
}
