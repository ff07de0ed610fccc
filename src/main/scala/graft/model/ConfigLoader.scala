package graft.model

import org.yaml.snakeyaml.Yaml
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** YAML → [[EngineConfig]] loader, mirroring the reference's boot path
  * (internal/config/config.go:96-121, cmd/aardappel/config.yaml):
  * read file → parse → verify (unknown problem_strategy is an error,
  * missing strategy defaults to stop). Field names keep the
  * reference's spelling where the concept carries over:
  *
  * {{{
  * instance_id: "0"
  * dst_root: /data/dst            # store root (dst_connection_string analog)
  * multiple_instances_mode: true  # standby instead of bootstrap failure
  * max_expected_heartbeat_interval: 10   # seconds, 0 disables
  * max_batch_size: 1000
  * buckets: 64
  * streams:
  *   - src_path: /data/src/events # src_topic analog (directory/topic)
  *     dst_table: users
  *     partitions: 8
  *     problem_strategy: stop     # stop | continue | cmd_queue
  * }}}
  *
  * Each stream keeps ITS OWN strategy (reference: per-stream
  * problem_strategy dispatch in the processor): a late change FATALs
  * the engine only if its stream says stop; a continue stream's late
  * rows go to the DLQ without halting the others.
  */
object ConfigLoader {

  def load(path: String): EngineConfig =
    parse(Files.readString(Paths.get(path)))

  def parse(yamlText: String): EngineConfig = {
    val root = Option(new Yaml().load[java.util.Map[String, Object]](yamlText))
      .getOrElse(throw new IllegalArgumentException("empty config"))
      .asScala.toMap

    def str(k: String): Option[String] = root.get(k).map(_.toString)
    def bool(k: String, dflt: Boolean): Boolean =
      root.get(k).map(_.toString.toBoolean).getOrElse(dflt)
    def num(k: String, dflt: Long): Long =
      root.get(k).map(_.toString.toLong).getOrElse(dflt)

    val instanceId = str("instance_id").getOrElse(
      throw new IllegalArgumentException("instance_id is required"))
    val dstRoot = str("dst_root").getOrElse(
      throw new IllegalArgumentException("dst_root is required"))

    val streamMaps = root.get("streams") match {
      case Some(l: java.util.List[_]) =>
        l.asScala.toSeq.map {
          case m: java.util.Map[_, _] =>
            m.asScala.map { case (k, v) => k.toString -> v }.toMap
          case other =>
            throw new IllegalArgumentException(s"bad stream entry: $other")
        }
      case _ =>
        throw new IllegalArgumentException("streams list is required")
    }
    if (streamMaps.isEmpty)
      throw new IllegalArgumentException("streams list is empty")

    val streams = streamMaps.zipWithIndex.map { case (m, i) =>
      // verify strategy per stream (config.go
      // verifyStreamProblemStrategy: empty = stop, unknown = hard error)
      val strategy = m.get("problem_strategy").map(_.toString.toLowerCase) match {
        case None | Some("") | Some("stop") => ProblemStrategy.Stop
        case Some("continue") => ProblemStrategy.Continue
        case Some("cmd_queue") => ProblemStrategy.CmdQueue
        case Some(other) =>
          throw new IllegalArgumentException(
            s"unknown stream problem strategy '$other'")
      }
      StreamConfig(
        tableId = i,
        srcPath = m.getOrElse("src_path",
          throw new IllegalArgumentException(s"stream $i: src_path required"))
          .toString,
        dstTable = m.getOrElse("dst_table",
          throw new IllegalArgumentException(s"stream $i: dst_table required"))
          .toString,
        partitions = m.get("partitions").map(_.toString.toInt).getOrElse(1),
        problemStrategy = Some(strategy))
    }

    EngineConfig(
      instanceId = instanceId,
      streams = streams,
      dstRoot = dstRoot,
      maxBatchSize = num("max_batch_size", 1000L).toInt,
      buckets = num("buckets", 64L).toInt,
      maxExpectedHbIntervalMs = num("max_expected_heartbeat_interval", 0L) * 1000L,
      multipleInstancesMode = bool("multiple_instances_mode", dflt = false),
      standbyMaxWaitMillis = num("standby_max_wait_millis", 600000L),
      monPort = str("mon_port").map(_.toInt))
  }
}
