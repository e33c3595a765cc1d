package graft

/** A non-`file:` Hadoop filesystem backed by the local disk — the
  * cheapest faithful stand-in for an object-store scheme (s3a, gs,
  * abfs): every path the engine touches must round-trip through
  * `Path.getFileSystem(conf)` + the `FileSystem` API with a scheme
  * and authority the code did not assume, which is exactly where
  * hidden `java.io.File` shortcuts or hardcoded `file:` assumptions
  * break. Registered in the spec via `fs.stub.impl`.
  */
class StubFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "stub"
  override def getUri: java.net.URI = java.net.URI.create("stub:///")
}

/** The `AbstractFileSystem` twin (the FileContext API resolves
  * schemes through `fs.AbstractFileSystem.<scheme>.impl`, separately
  * from the FileSystem registry) — IndexManifest's pointer/claim ops
  * run on FileContext, so the stub scheme needs both bindings. */
class StubAbstractFileSystem(uri: java.net.URI,
                             conf: org.apache.hadoop.conf.Configuration)
  extends org.apache.hadoop.fs.DelegateToFileSystem(
    uri, new StubFileSystem, conf, "stub", false)
