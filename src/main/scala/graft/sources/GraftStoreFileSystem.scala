package graft.sources

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.RawLocalFileSystem

/** A local-disk object-store stand-in under its own URI scheme
  * (`graftstore:/...`) — the sandbox's MinIO/LocalStack: the reference
  * develops against a local S3 endpoint
  * (pandas_based/src/athlete_scrape.py:29-39) precisely so the
  * path-layout and commit code runs against the REAL storage API before
  * production credentials exist. This sandbox has no S3 endpoint at
  * all, so the stand-in drops one level lower: a Hadoop FileSystem
  * registered under a non-default scheme, backed by local disk.
  *
  * What this makes testable end-to-end (and what s3a:// would exercise
  * minus the wire protocol): FileSystem resolution from the URI scheme
  * via `fs.<scheme>.impl`, scheme-qualified path handling through every
  * Tables read/write, the output committer's task-attempt staging dirs
  * and job-commit RENAMES, directory listings behind the manifest/
  * zone-map/compaction maintenance paths, and parquet footer reads
  * through `HadoopInputFile`. Rename here is a real filesystem rename
  * (the semantics HDFS gives); an object store's copy+delete "rename"
  * is exactly why [[ObjectStore.committerConfs]] selects the magic
  * committer when s3a is live.
  *
  * Not a production class — a test/dev shim, registered only by
  * [[ObjectStore.configureLocalEmulator]].
  */
class GraftStoreFileSystem extends RawLocalFileSystem {

  // the SUPERCLASS constructor already calls back into getUri (via
  // getInitialWorkingDirectory → makeQualified), before this class's
  // field initializers have run — so the field starts null by design
  // and getUri supplies the default scheme until initialize() pins the
  // real one
  private var fsUri: URI = _

  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    // keep only scheme(+authority): the FileSystem cache keys on these,
    // and makeQualified stamps them onto every returned path (a bare
    // "scheme://" is not a valid URI — authority-less uses "scheme:///")
    fsUri = Option(uri.getAuthority) match {
      case Some(a) => URI.create(uri.getScheme + "://" + a)
      case None => URI.create(uri.getScheme + ":///")
    }
  }

  override def getScheme: String = getUri.getScheme
  override def getUri: URI =
    if (fsUri == null) URI.create("graftstore:///") else fsUri
}
