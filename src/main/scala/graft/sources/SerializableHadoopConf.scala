package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Java-serializable carrier for a Hadoop [[Configuration]] (which is
  * `Writable` but not `Serializable`), so DSv2 reader factories can ship
  * the session's FS settings/credentials to executors. Same shape as
  * Spark's internal `SerializableConfiguration`, which is
  * `private[spark]` and therefore not usable from a third-party
  * connector. */
class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
