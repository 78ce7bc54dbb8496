package graft

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** A local filesystem registered under the `graftfs://` scheme ONLY via
  * `fs.graftfs.impl` on the session's Hadoop conf — never in any
  * classpath default. A task that builds its own fresh `Configuration`
  * cannot resolve the scheme, so writes through it prove the session
  * conf actually reached the executors (WarcSpec). */
class GraftTestFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("graftfs:///")
  override def getScheme: String = "graftfs"
}
