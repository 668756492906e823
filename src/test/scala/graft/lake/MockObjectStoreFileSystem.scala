package graft.lake

import org.apache.hadoop.fs.RawLocalFileSystem
import java.net.URI

/** A Hadoop FileSystem registered under the `mocks3://` scheme (backed by
  * the local disk). The lake pipeline claims s3a-compatibility BY
  * CONSTRUCTION — every byte it moves goes through
  * `Path.getFileSystem(conf)` — and no S3 endpoint, SDK, or hadoop-aws
  * module exists in this offline environment, so that claim is tested the
  * way it actually holds: run the whole pipeline against a NON-`file://`
  * scheme resolved through the same `fs.<scheme>.impl` configuration
  * mechanism s3a uses. Any code path that bypassed the Hadoop FS API
  * (java.io, hardcoded `file://`) fails this scheme, exactly as it would
  * fail s3a.
  */
final class MockObjectStoreFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mocks3"
  override def getUri: URI = URI.create("mocks3:///")
}
