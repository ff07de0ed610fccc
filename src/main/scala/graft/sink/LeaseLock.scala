package graft.sink

import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Single-writer lease lock — the reference's active/standby guarantee
  * (distributed lease in the state table, re-checked inside every apply
  * transaction: ydb_locker, main.go:384-430) re-expressed over the
  * store's filesystem/object-store primitives.
  *
  * A lock is a small JSON blob {owner, deadlineMillis} replaced
  * atomically. Acquire succeeds when the lock is absent, expired, or
  * already ours; every commit re-checks ownership before the manifest
  * swap (the "owner check inside the transaction"). TTL should be
  * 2x the heartbeat interval, like the reference. On a real object
  * store the atomic rename becomes a conditional put.
  */
final class LeaseLock(root: String, owner: String, ttlMillis: Long,
    clock: () => Long = () => System.currentTimeMillis()) {

  private val om = new ObjectMapper()
  private def lockPath: Path = Paths.get(root, "LOCK")

  private def readLock(): Option[(String, Long)] =
    if (!Files.exists(lockPath)) None
    else try {
      val n = om.readTree(Files.readString(lockPath))
      Some((n.get("owner").asText(), n.get("deadline").asLong()))
    } catch { case _: Exception => None }

  private def writeLock(deadline: Long): Unit = {
    val node = om.createObjectNode()
    node.put("owner", owner)
    node.put("deadline", deadline)
    val tmp = lockPath.resolveSibling(s"LOCK.$owner.tmp")
    Files.writeString(tmp, om.writeValueAsString(node))
    Files.move(tmp, lockPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Try to take (or renew) the lease. */
  def tryAcquire(): Boolean = readLock() match {
    case Some((o, deadline)) if o != owner && deadline > clock() => false
    case _ => writeLock(clock() + ttlMillis); true
  }

  /** Owner check for the commit path: we must still hold an unexpired
    * lease. Call immediately before the manifest swap.
    */
  def verifyHeld(): Boolean = readLock() match {
    case Some((o, deadline)) => o == owner && deadline > clock()
    case None => false
  }

  def release(): Unit = readLock() match {
    case Some((o, _)) if o == owner => Files.deleteIfExists(lockPath)
    case _ => ()
  }
}
