package graft.storage

/** K5 — object-store PUT with versioned-delete retry
  * (discharge_obs_pd.py:265-330).
  *
  * The reference exists because versioned MinIO buckets accumulate
  * non-current object versions until puts start failing; its recovery is:
  * on S3Error, delete every non-current version of the key — looping,
  * because versions sit in a STACK and deleting one layer exposes the
  * next (`delete_all_non_current_version`, :281-330) — then retry the put
  * once.
  *
  * This is driver-side store maintenance, not an engine operator: the
  * store operations are behind `VersionedObjectStore` so deployments bind
  * the S3/boto-equivalent SDK while tests inject fakes. The engine's
  * parquet writes (`ObsStore`) address the filesystem directly and don't
  * need this path unless the target bucket is versioned.
  */
trait VersionedObjectStore {

  /** Upload `localPath` to `storePath` (throws on failure, like the
    * reference's `ostore.put_object`). */
  def put(localPath: String, storePath: String): Unit

  /** Version ids of all NON-current versions (including delete markers)
    * currently visible for `storePath` — one "layer" of the stack. */
  def listNonCurrentVersions(storePath: String): Seq[String]

  /** Bulk-delete the given version ids of `storePath`. */
  def deleteVersions(storePath: String, versionIds: Seq[String]): Unit
}

object StoreMaintenance {

  /** Purge non-current versions layer by layer until none remain
    * (discharge_obs_pd.py:281-330). Returns the number deleted.
    * `maxRounds` guards against a store that keeps reporting versions
    * (the reference loops unboundedly; a misbehaving endpoint would hang
    * its cron job).
    */
  def purgeNonCurrentVersions(store: VersionedObjectStore, storePath: String,
                              maxRounds: Int = 10000): Int = {
    var total = 0
    var rounds = 0
    var layer = store.listNonCurrentVersions(storePath)
    while (layer.nonEmpty && rounds < maxRounds) {
      store.deleteVersions(storePath, layer)
      total += layer.size
      rounds += 1
      layer = store.listNonCurrentVersions(storePath)
    }
    if (layer.nonEmpty)
      throw new IllegalStateException(
        s"version purge of $storePath did not converge after $maxRounds rounds")
    total
  }

  /** PUT with the reference's recovery: on failure, purge non-current
    * versions and retry ONCE (discharge_obs_pd.py:265-280 — the retry is
    * not wrapped again; a second failure propagates).
    */
  def putWithVersionPurgeRetry(store: VersionedObjectStore,
                               localPath: String, storePath: String): Unit =
    try store.put(localPath, storePath)
    catch {
      case scala.util.control.NonFatal(_) =>
        purgeNonCurrentVersions(store, storePath)
        store.put(localPath, storePath)
    }
}
