package graft

import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Local filesystem under a `countfs://` scheme that RECORDS every
  * open() — planning-I/O assertions (e.g. "the kafka source's
  * endOffsets opens ONLY the active segment") read the log. Shared
  * static state is fine: tests run in one JVM (local mode). */
class CountingFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("countfs:///")
  override def open(f: Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    CountingFileSystem.opened.add(f.toUri.getPath)
    super.open(f, bufferSize)
  }
}

object CountingFileSystem {
  val opened = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def reset(): Unit = opened.clear()
  def openedPaths: Seq[String] = {
    val it = opened.iterator()
    val b = Seq.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result()
  }
}
