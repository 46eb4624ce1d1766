package graft

/** A RawLocalFileSystem registered under a NON-`file:` scheme
  * (`mockfs:`): the round-15 Hadoop-FS port of the MV artifact probes
  * (hasData, signature sidecars) must work against whatever scheme
  * STATE_DIR carries — hdfs://, s3a:// in a deployment — and this is
  * the in-image stand-in: same Hadoop FileSystem API surface, local
  * disk underneath, and crucially a path the old
  * `java.io.File(stripPrefix("file:"))` probes could never resolve.
  */
class MockFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("mockfs:///")
}
