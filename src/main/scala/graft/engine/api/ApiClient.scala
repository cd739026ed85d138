package graft.engine.api

/** Backend metadata API (SURVEY.md §2.10 K3, `api/client.py`): per
  * batch only METADATA leaves the cluster — (data_id, data_intent,
  * label, is_sample, ingestor_id) — plus a post-run registration
  * sequence that is REQUIRED and fail-loud ("committed-but-unregistered
  * rows" contract, `base.py:858-918`).
  *
  * This environment has zero egress, so the shipped implementation is
  * the reference's own local mode (`CLIENT_ENV=local` mock,
  * `api/client.py:36-63`): an in-memory recorder with identical call
  * semantics. A production HTTP client implements the same trait with
  * retry (5 total, backoff on 5xx) and one 401-refresh
  * (`api/client.py:65-80`, `:174-215`).
  */
final case class MetaRecord(dataId: String, dataIntent: String,
                            label: String, isSample: Boolean, ingestorId: String)

trait ApiClient extends Serializable {
  /** Register one batch of row metadata. Called from EXECUTOR tasks;
    * Spark task retries and speculation make delivery at-least-once
    * per partition, so implementations/backends MUST be idempotent
    * keyed on `dataId` (re-sending an acknowledged record is a no-op
    * upsert, never a duplicate).
    */
  def sendBatch(table: String, batch: Seq[MetaRecord]): Either[String, Int]
  def sendGenerateEdgeLabelMeta(table: String): Either[String, Unit]
  def sendGlobalMeta(table: String, schemaJson: String): Either[String, Unit]
  def prepareDataset(table: String): Either[String, Unit]
  def createDataset(table: String): Either[String, Unit]

  /** The registration sequence (`base.py:861-918`): edge-label meta
    * (skipped for self-supervised) → global meta → prepare → create.
    * Any failure raises — rows are committed but unregistered, and the
    * contract is to fail LOUD, never swallow.
    */
  def registerDataset(table: String, schemaJson: String,
                      selfSupervised: Boolean): Either[String, Unit] =
    for {
      _ <- if (selfSupervised) Right(()) else sendGenerateEdgeLabelMeta(table)
      _ <- sendGlobalMeta(table, schemaJson)
      _ <- prepareDataset(table)
      _ <- createDataset(table)
    } yield ()
}

/** Local mock: records everything, fails nothing. Thread-safe —
  * executor tasks may send batches concurrently in local mode.
  *
  * Recording state lives in a JVM-static store keyed by `recorderId`,
  * NOT in instance fields: batch sends run inside `foreachPartition`
  * tasks, whose closures carry a *deserialized copy* of this client.
  * With instance fields the copy would record into itself and the
  * driver's instance would stay empty; with the static store every
  * copy in the JVM (driver and local-mode executors share one) appends
  * to the same queues. On a real multi-JVM cluster this mock would
  * record per-executor — it is the local/test analogue of the
  * reference's `CLIENT_ENV=local` mode, never a production transport.
  *
  * Retention: the static store lives for the JVM (it cannot know when
  * the last serialized copy dies), so a long-lived process creating
  * many recorders should call [[discard]] when finished with one.
  * Test-suite scale — dozens of instances, metadata-sized batches —
  * is fine without it.
  */
final class LocalApiClient extends ApiClient {
  private val recorderId: String = java.util.UUID.randomUUID().toString

  private def store: LocalApiClient.Store =
    LocalApiClient.stores.computeIfAbsent(recorderId, _ => new LocalApiClient.Store)

  def batches: java.util.concurrent.ConcurrentLinkedQueue[(String, Seq[MetaRecord])] =
    store.batches
  def calls: java.util.concurrent.ConcurrentLinkedQueue[String] = store.calls

  def sendBatch(table: String, batch: Seq[MetaRecord]): Either[String, Int] = {
    batches.add((table, batch)); Right(batch.size)
  }
  def sendGenerateEdgeLabelMeta(table: String): Either[String, Unit] = {
    calls.add(s"edge_label_meta:$table"); Right(())
  }
  def sendGlobalMeta(table: String, schemaJson: String): Either[String, Unit] = {
    calls.add(s"global_meta:$table"); Right(())
  }
  def prepareDataset(table: String): Either[String, Unit] = {
    calls.add(s"prepare:$table"); Right(())
  }
  def createDataset(table: String): Either[String, Unit] = {
    calls.add(s"create:$table"); Right(())
  }
  def sentCount: Int = {
    var n = 0
    batches.forEach { case (_, b) => n += b.size }
    n
  }

  /** Drop this recorder's static store (see class note on retention). */
  def discard(): Unit = LocalApiClient.stores.remove(recorderId)
}

object LocalApiClient {
  private[api] final class Store {
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[(String, Seq[MetaRecord])]()
    val calls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  }
  private val stores =
    new java.util.concurrent.ConcurrentHashMap[String, Store]()
}
