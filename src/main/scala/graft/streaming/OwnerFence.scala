package graft.streaming

import org.apache.hadoop.fs.Path

/** Single-writer FENCING for artifact maintainers — a monotone owner
  * epoch on the artifact's own storage (`<dir>/e%06d.txt`, landed by
  * rename-without-overwrite): construction ACQUIRES the next epoch, and
  * the maintainer re-checks `assertOwner` at every mutation entry (and,
  * where a marker rename is the commit point, immediately before it).
  * Recovery therefore TAKES OVER: a still-live prior maintainer on the
  * same workDir observes a higher epoch and fails loud — FENCED — before
  * it can commit, so a zombie process's in-flight work is either never
  * published or is left as the uncommitted/beyond-the-pin debris its
  * artifact's own crash recovery already discards.
  *
  * Why fencing and not a lock file: a lease with no TTL deadlocks on the
  * holder's crash, and a TTL needs clock trust; the epoch needs neither —
  * ownership transfers the moment the new maintainer lands its file, and
  * the loser's next check (one listing of a GC-bounded directory) ends
  * it. The residual check→commit window is backstopped by each
  * maintainer's own atomic commit primitive (versioned rename), exactly
  * as Delta-style optimistic writers backstop theirs. This is the
  * standard fencing-token construction (ZooKeeper epochs, HDFS lease
  * recovery) on plain filesystem primitives.
  */
private[streaming] object OwnerFence {

  private def epochPath(dir: String, e: Int): Path =
    new Path(f"$dir%s/e$e%06d.txt")

  /** Every landed epoch, unsorted (the directory is GC-bounded). */
  def epochs(fs: org.apache.hadoop.fs.FileSystem, dir: String): Seq[Int] = {
    val p = new Path(dir)
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("e") && n.endsWith(".txt") =>
        n.stripPrefix("e").stripSuffix(".txt").toInt }
  }

  /** Land the next owner epoch by rename-without-overwrite; a lost race
    * (two recoveries at once) bumps and retries — both get DISTINCT
    * epochs, and whichever holds the max after the dust settles owns the
    * artifact (the other is fenced at its first mutation).
    */
  def acquire(fs: org.apache.hadoop.fs.FileSystem, dir: String): Int = {
    fs.mkdirs(new Path(dir))
    var e = epochs(fs, dir).maxOption.getOrElse(0) + 1
    while (true) {
      val tmp = new Path(s"$dir/.tmp-${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, false)
      try out.write(e.toString.getBytes("UTF-8")) finally out.close()
      if (fs.rename(tmp, epochPath(dir, e))) return e
      fs.delete(tmp, false)
      e += 1
    }
    -1 // unreachable
  }

  /** Fail loud if a newer epoch has landed since `epoch` was acquired —
    * or if NO epoch file is listable at all: the caller acquired one, so
    * an empty listing means the owner directory was deleted out-of-band
    * or the store returned an inconsistent listing, and defaulting to
    * "still owner" would silently un-fence EVERY maintainer at once
    * (the vacuous-pass hole). Ownership is only ever asserted against
    * evidence on disk.
    */
  def assertOwner(
      fs: org.apache.hadoop.fs.FileSystem, dir: String, epoch: Int,
      what: String): Unit = {
    val all = epochs(fs, dir)
    require(all.nonEmpty,
      s"$what: FENCED — owner directory $dir lists no epoch files at all " +
        s"(this maintainer acquired epoch $epoch, so its file should " +
        "exist); the directory was deleted out-of-band or the listing is " +
        "inconsistent — refusing to mutate without ownership evidence")
    val mx = all.max
    require(mx == epoch,
      s"$what: FENCED — this maintainer's epoch $epoch was superseded " +
        s"by $mx (another maintainer recovered the workDir); its " +
        "in-flight work is discarded by the artifact's own recovery")
  }

  /** Drop superseded epoch files (only the max fences) and crashed
    * acquires' `.tmp-*` debris; returns count. Deleting a tmp a
    * CONCURRENT acquire is mid-rename on is harmless: that rename
    * returns false and the acquire loop retries with the next epoch.
    */
  def gcSuperseded(
      fs: org.apache.hadoop.fs.FileSystem, dir: String): Int = {
    val all = epochs(fs, dir)
    val mx = all.maxOption.getOrElse(0)
    val old = all.filter(_ < mx)
    old.foreach(e => fs.delete(epochPath(dir, e), false))
    val p = new Path(dir)
    val tmps =
      if (!fs.exists(p)) Seq.empty[Path]
      else fs.listStatus(p).toSeq.map(_.getPath)
        .filter(_.getName.startsWith(".tmp-"))
    tmps.foreach(fs.delete(_, false))
    old.size + tmps.size
  }
}
