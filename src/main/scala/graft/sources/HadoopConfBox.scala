package graft.sources

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Serializable carrier for a Hadoop `Configuration` — the session's
  * filesystem settings (s3a credentials, hdfs nameservices, buffer
  * sizes) must travel from the driver into tasks that open streams
  * through the Hadoop FileSystem API, and `Configuration` itself is
  * not `java.io.Serializable`. Same shape as Spark's internal
  * wrapper (`org.apache.spark.util.SerializableConfiguration`), owned
  * here because that class is not public API.
  */
final class HadoopConfBox(@transient var value: Configuration)
    extends Serializable {

  @throws[IOException]
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  @throws[IOException]
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
