package graft.catalog

/** Lazily-computed immutable collections backing POINTER-LEVEL commits.
  *
  * A [[Snapshot]] is the public result of every write: its `files` /
  * `fileStats` fields carry the table's FULL inventory. Materializing that
  * inventory is the one O(all files) cost a pure metadata commit (append,
  * MoR delete, schema evolution) would otherwise pay — at the 10^6-file
  * regime, a driver-side JSON parse of every manifest shard just to return
  * a value most callers never read. These wrappers keep the Snapshot shape
  * (plain `Seq`/`Map` fields, structural equality, JSON serialization all
  * intact — they force on first traversal) while deferring the shard loads
  * until a caller actually walks the inventory.
  *
  * Soundness: the thunk closes over a pointer-log ENTRY whose manifest
  * shards are write-once — the resolution is the same whenever it runs, on
  * any thread (`lazy val` gives the usual synchronized once-only
  * evaluation), with or without the table lock held. */
private[graft] final class DeferredSeq[A](thunk: () => Seq[A])
    extends scala.collection.immutable.Seq[A] {
  private lazy val underlying: Seq[A] = thunk()
  override def apply(i: Int): A = underlying(i)
  override def length: Int = underlying.length
  override def iterator: Iterator[A] = underlying.iterator
  // never force just to render in debuggers/logs
  override def toString: String = "DeferredSeq(<lazy>)"
}

private[graft] final class DeferredMap[K, +V](thunk: () => Map[K, V])
    extends scala.collection.immutable.Map[K, V] {
  private lazy val underlying: Map[K, V] = thunk()
  override def get(key: K): Option[V] = underlying.get(key)
  override def iterator: Iterator[(K, V)] = underlying.iterator
  override def removed(key: K): Map[K, V] = underlying.removed(key)
  override def updated[V1 >: V](key: K, value: V1): Map[K, V1] =
    underlying.updated(key, value)
  override def size: Int = underlying.size
  override def toString: String = "DeferredMap(<lazy>)"
}
