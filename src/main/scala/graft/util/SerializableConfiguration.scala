package graft.util

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Hadoop Configuration is not Serializable; Spark keeps its own
  * private wrapper for shipping it to executors
  * (org.apache.spark.util.SerializableConfiguration — private[spark]).
  * Standard pattern for libraries that run Hadoop FS code in tasks.
  */
class SerializableConfiguration(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: ObjectOutputStream): Unit =
    try {
      out.defaultWriteObject()
      value.write(out)
    } catch { case e: Exception => throw new IOException(e) }

  private def readObject(in: ObjectInputStream): Unit =
    try {
      in.defaultReadObject()
      value = new Configuration(false)
      value.readFields(in)
    } catch { case e: Exception => throw new IOException(e) }
}
