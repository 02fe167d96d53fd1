package graft.source

import org.scalatest.funsuite.AnyFunSuite

/** The executor-side write path must see the SESSION's Hadoop config —
  * a session-set entry (object-store credential, defaultFS) has to
  * survive task serialization into [[GroupDataWriterFactory]].
  */
class SerializableConfSpec extends AnyFunSuite {

  test("session-set hadoop config entries survive task serialization") {
    val conf = new org.apache.hadoop.conf.Configuration()
    conf.set("graft.test.credential", "sekret-value")
    conf.set("fs.defaultFS", "file:///")
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(new SerializableConf(conf)); oos.close()
      bos.toByteArray
    }
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes))
      .readObject().asInstanceOf[SerializableConf].value
    assert(back.get("graft.test.credential") == "sekret-value",
      "a session-set credential must reach the executor writer")
    assert(back.get("fs.defaultFS") == "file:///")
  }
}
