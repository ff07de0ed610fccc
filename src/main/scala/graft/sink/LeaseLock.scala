package graft.sink

import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Single-writer lease lock — the reference's active/standby guarantee
  * (distributed lease in the state table, re-checked inside every apply
  * transaction: ydb_locker, main.go:384-430) re-expressed over the
  * store's filesystem/object-store primitives.
  *
  * Layout: one file per lease generation, root/LOCK.v{token}, holding
  * {owner, deadline, token}; the CURRENT lease is the highest token.
  * Acquisition of generation N+1 is an exclusive create of LOCK.v{N+1}
  * (no REPLACE_EXISTING) — the filesystem arbitrates every race with
  * exactly one winner, including stale contenders: a contender that
  * read an old generation computes a filename that already exists and
  * fails. After a successful create the acquirer re-reads the head; if
  * a higher generation appeared meanwhile, it deletes its own file and
  * reports failure, so even multi-generation stragglers cannot win.
  *
  * The token doubles as the FENCING token: it increases on every
  * ownership change (renewal keeps it), the commit path stamps it into
  * the manifest, and TransactionalStore.commit refuses tokens below
  * the stored head's — a paused writer that lost its lease cannot
  * clobber the new owner's commits. Renewal/release rewrite only the
  * owner's OWN generation file, which no other instance ever writes.
  * On a real object store the exclusive create maps to a conditional
  * put (if-none-match).
  */
final class LeaseLock(root: String, owner: String, ttlMillis: Long,
    clock: () => Long = () => System.currentTimeMillis()) {

  private val om = new ObjectMapper()
  private def dir: Path = Paths.get(root)
  private def genPath(token: Long): Path = dir.resolve(s"LOCK.v$token")

  /** The fencing token of OUR current acquisition, if any. */
  @volatile private var myToken: Option[Long] = None
  def heldToken: Option[Long] = myToken

  private def parseLock(p: Path): Option[(String, Long, Long)] =
    try {
      val n = om.readTree(Files.readString(p))
      Some((n.get("owner").asText(), n.get("deadline").asLong(),
        n.get("token").asLong()))
    } catch { case _: Exception => None }

  /** Run `f` over the lock-generation files; the Files.list stream is
    * CLOSED afterward (it holds a directory fd, and readHead runs per
    * batch commit and per /readyz scrape).
    */
  private def withGenerations[A](f: Iterator[(Long, Path)] => A): A = {
    val s = Files.list(dir)
    try f(s.iterator().asScala
      .filter(_.getFileName.toString.startsWith("LOCK.v"))
      .flatMap(p => p.getFileName.toString.stripPrefix("LOCK.v")
        .toLongOption.map(_ -> p)))
    finally s.close()
  }

  /** The highest-generation lease on disk. */
  private def readHead(): Option[(String, Long, Long)] = {
    if (!Files.isDirectory(dir)) return None
    val gens = withGenerations(_.toSeq)
    gens.sortBy(-_._1).iterator.map(_._2).flatMap(parseLock).nextOption()
  }

  private def renderLock(o: String, deadline: Long, token: Long): String = {
    val node = om.createObjectNode()
    node.put("owner", o)
    node.put("deadline", deadline)
    node.put("token", token)
    om.writeValueAsString(node)
  }

  private def writeTmp(content: String): Path = {
    val tmp = dir.resolve(s"LOCK.$owner.${System.nanoTime()}.tmp")
    Files.writeString(tmp, content)
    tmp
  }

  /** Exclusive create of generation `token`; one winner per token.
    * NOTE open(O_CREAT|O_EXCL) is the only truly atomic
    * create-exclusive here — Files.move WITHOUT REPLACE_EXISTING is
    * check-then-rename on POSIX and two movers can both pass the
    * check (observed in the race spec). CREATE_NEW writes the content
    * in the same open, so the unparsable-head window is the µs between
    * open and write (it was create → tmp-write → rename). A reader
    * catching that window parses nothing and treats the previous
    * generation as head; the worst case is a contender losing one
    * tryAcquire attempt (it computes this same token and loses the
    * O_EXCL race), which its next poll retries. That is PREFERRED over
    * a marker+content two-file protocol: exclusivity never depends on
    * content visibility, and readers never block on a pending head.
    */
  private def createGeneration(token: Long): Boolean = {
    val won =
      try {
        Files.write(genPath(token),
          renderLock(owner, clock() + ttlMillis, token)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        true
      }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    if (!won) return false
    // straggler guard: if a higher generation appeared while we were
    // writing, our generation is already superseded — back out
    readHead() match {
      case Some((_, _, tk)) if tk > token =>
        Files.deleteIfExists(genPath(token)); false
      case _ =>
        myToken = Some(token)
        // superseded generations are dead weight; safe to sweep
        if (Files.isDirectory(dir))
          withGenerations(_.filter(_._1 < token)
            .foreach { case (_, p) => Files.deleteIfExists(p) })
        true
    }
  }

  /** Rewrite our OWN generation file (renewal / release marker). */
  private def rewriteOwn(deadline: Long, token: Long): Unit = {
    val tmp = writeTmp(renderLock(owner, deadline, token))
    Files.move(tmp, genPath(token), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Try to take (or renew) the lease. */
  def tryAcquire(): Boolean = readHead() match {
    case Some((o, deadline, tk)) if o == owner && deadline > clock() &&
        myToken.contains(tk) =>
      rewriteOwn(clock() + ttlMillis, tk)
      verifyHeld()
    case Some((o, deadline, _)) if o != owner && deadline > clock() =>
      false
    case Some((_, _, tk)) =>
      // expired head, or a same-owner lock from a previous life
      createGeneration(tk + 1)
    case None =>
      createGeneration(1L)
  }

  /** Block until the lease is ours (standby mode — the reference's
    * multiple_instances_mode lock wait, main.go:421-427). Returns
    * false on timeout.
    */
  def awaitAcquire(maxWaitMillis: Long, pollMillis: Long = 500L): Boolean = {
    val deadline = System.currentTimeMillis() + maxWaitMillis
    var got = tryAcquire()
    while (!got && System.currentTimeMillis() < deadline) {
      Thread.sleep(pollMillis)
      got = tryAcquire()
    }
    got
  }

  /** Owner check for the commit path: we must still hold an unexpired
    * lease under OUR token. Call immediately before the manifest swap.
    */
  def verifyHeld(): Boolean = readHead() match {
    case Some((o, deadline, tk)) =>
      o == owner && deadline > clock() && myToken.contains(tk)
    case None => false
  }

  /** Graceful handover: expire our own generation in place; the token
    * stays on disk so the next owner's token is strictly greater.
    */
  def release(): Unit = readHead() match {
    case Some((o, _, tk)) if o == owner && myToken.contains(tk) =>
      rewriteOwn(Long.MinValue, tk)
      myToken = None
    case _ => ()
  }
}
