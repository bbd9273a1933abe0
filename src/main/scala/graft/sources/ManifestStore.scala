package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * MANIFEST-BASED snapshot chain — the table-format core (Iceberg/Delta's
 * load-bearing idea) built Spark-first: a version is a MANIFEST (a small
 * file listing the data files it comprises), data files are IMMUTABLE and
 * SHARED between versions, and a delta publish rewrites only the
 * partitions it touches while carrying every untouched file forward BY
 * REFERENCE — the manifest-pointer move that [[Sink.purgeTombstones]]'s
 * directory RENAME only approximates (a rename carries bytes-untouched
 * files into the new snapshot but DESTROYS the old snapshot's
 * readability; a manifest reference keeps every retained version
 * queryable forever, which is what makes w13-style time travel and
 * concurrent readers safe during publishes).
 *
 * Layout under `root`:
 * {{{
 *   data/<bucketCol>=<b>/part-*.parquet   immutable, append-only
 *   manifests/<version>.manifest          one RELATIVE data-file path per line
 * }}}
 *
 * The flip side of file sharing is garbage collection: deleting an old
 * version must not delete files a retained version still references, so
 * [[vacuum]] is a REACHABILITY sweep (Iceberg `expire_snapshots` + orphan
 * cleanup): reachable = ∪ retained manifests; everything else under
 * `data/` is deleted. Reachability is computed from manifests alone —
 * metadata-sized work no matter how big the store is.
 *
 * Scale shape: manifests are O(files) text; the only data-sized work in a
 * delta publish is reading + rewriting the AFFECTED buckets (named by the
 * delta's derived bucket values — w10's derivability contract), and the
 * merge there is [[graft.operators.Upsert.merge]]'s one join. Nothing
 * ever lists or scans the unaffected part of a 100-TB store; vacuum's
 * file listing is the one full `data/` enumeration, and it reads no data
 * bytes. Single-writer per root (the publish captures "files I just
 * wrote" as a before/after listing diff); multi-writer needs the
 * compare-and-swap manifest commit real table formats add on top.
 */
object ManifestStore {

  private def fsOf(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataPath(root: String) = s"$root/data"
  private def manifestPath(root: String, version: String) =
    new Path(s"$root/manifests/$version.manifest")

  /** All parquet data files currently on disk, RELATIVE to `data/`. */
  def listDataFiles(spark: SparkSession, root: String): Set[String] = {
    val fs = fsOf(spark, root)
    val base = new Path(dataPath(root))
    if (!fs.exists(base)) return Set.empty
    val it = fs.listFiles(base, true)
    val out = Set.newBuilder[String]
    val prefix = base.toUri.getPath + "/"
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.endsWith(".parquet"))
        out += f.toUri.getPath.stripPrefix(prefix)
    }
    out.result()
  }

  def readManifest(spark: SparkSession, root: String, version: String): Seq[String] = {
    val fs = fsOf(spark, root)
    val in = fs.open(manifestPath(root, version))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  private def writeManifest(spark: SparkSession, root: String, version: String,
      files: Seq[String]): Unit = {
    val fs = fsOf(spark, root)
    val out = fs.create(manifestPath(root, version), true)
    try out.write((files.sorted.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Versions sorted lexicographically — names must be chosen to sort
    * in publish order (v0, v1, … or zero-padded v00042): the LAST one is
    * the head the concurrency check in [[publishDelta]] compares against. */
  def listVersions(spark: SparkSession, root: String): Seq[String] = {
    val fs = fsOf(spark, root)
    val dir = new Path(s"$root/manifests")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.endsWith(".manifest")).map(_.stripSuffix(".manifest"))
      .toSeq.sorted
  }

  /** First publish: the full state partitioned by `bucketCol`; the
    * version's manifest is everything just written. Wipes any prior
    * store at `root` (idempotent re-runs must not append into a stale
    * chain — the w6 lesson: never rely on the session's overwrite mode). */
  def publishInitial(spark: SparkSession, state: DataFrame, root: String,
      version: String, bucketCol: String): Unit = {
    val fs = fsOf(spark, root)
    fs.delete(new Path(root), true)
    state.write.mode("overwrite").partitionBy(bucketCol).parquet(dataPath(root))
    writeManifest(spark, root, version, listDataFiles(spark, root).toSeq)
  }

  /**
   * Delta publish: merge `delta` (a latest-state batch) into the buckets
   * it touches, write ONLY those buckets' new files, and reference every
   * other file from `prevVersion`'s manifest unchanged. The merged
   * content is [[graft.operators.Upsert.merge]]'s EXCLUDED-wins state
   * (first_seen min / last_seen max / newest payload), so a chain of
   * time-ordered delta publishes equals the one-shot build — the s5 fold
   * discipline, here at partition granularity on a shared-file store.
   */
  def publishDelta(spark: SparkSession, delta: DataFrame, root: String,
      prevVersion: String, version: String, bucketCol: String, keyCol: String,
      payload: Seq[String], schema: String): Unit = {
    val prevFiles = readManifest(spark, root, prevVersion)
    val affected = delta.select(col(bucketCol)).distinct()
      .collect().map(_.get(0)).toSet
    require(affected.nonEmpty, "empty delta: nothing to publish")
    val prefixes = affected.map(b => s"$bucketCol=$b/")
    val baseFiles = prevFiles.filter(f => prefixes.exists(f.startsWith))
    val merged = if (baseFiles.isEmpty) delta else {
      val base = spark.read.schema(schema)
        .option("basePath", dataPath(root))
        .parquet(baseFiles.map(f => s"${dataPath(root)}/$f"): _*)
      graft.operators.Upsert.merge(base, delta, keyCol, payload :+ bucketCol)
    }
    // merged's bucket set equals `affected` by construction (base is read
    // bucket-pruned to it; EXCLUDED-wins keeps every delta bucket), so
    // pass it through — re-deriving it in publishDeltaMerged was one
    // whole distinct+collect Spark job per publish for a set already in
    // hand (r16; the FrontierState callers already threaded theirs).
    publishDeltaMerged(spark, merged, root, prevVersion, version, bucketCol,
      Some(affected))
  }

  /**
   * Delta publish where `merged` is ALREADY the complete new content of
   * every bucket it mentions (the caller ran its own fold — e.g. the
   * frontier state's sum/min fold, which [[graft.operators.Upsert.merge]]'s
   * EXCLUDED-wins semantics cannot express). Writes ONLY those buckets'
   * new files, carries every other file forward by reference, and
   * THROWS if the write strays outside the affected buckets — the gate
   * that pins per-trigger write cost to the trigger's bucket spread,
   * never the state size (the w3/s9 gate discipline on frontier state).
   */
  def publishDeltaMerged(spark: SparkSession, merged: DataFrame, root: String,
      prevVersion: String, version: String, bucketCol: String,
      affectedKnown: Option[Set[Any]] = None): Unit = {
    // optimistic concurrency: a publish prepared against a version that
    // is no longer the head must FAIL, not silently drop the interleaved
    // publish's changes (the compare-and-swap check a real table format
    // runs at manifest-commit time; here the single-writer assumption is
    // checked, not just assumed)
    val head = listVersions(spark, root).lastOption
    require(head.contains(prevVersion),
      s"stale publish: prepared against $prevVersion but head is $head")
    val prevFiles = readManifest(spark, root, prevVersion)
    // affectedKnown skips the distinct-collect job when the caller
    // already knows the bucket set — it must then be EXACTLY merged's
    // bucket set: a superset would drop untouched buckets' prior files
    // from the carry list without replacing them
    val affected = affectedKnown.getOrElse(
      merged.select(col(bucketCol)).distinct().collect().map(_.get(0)).toSet)
    require(affected.nonEmpty, "empty delta: nothing to publish")
    val prefixes = affected.map(b => s"$bucketCol=$b/")
    val carried = prevFiles.filterNot(f => prefixes.exists(f.startsWith))
    // STAGED write (r17): the delta lands in a throwaway staging dir,
    // whose depth-1 partition listing is the EXACT bucket set the write
    // produced — O(delta buckets) — so the stray-write gate the r16
    // bucket-scoping weakened (a stray into an existing foreign bucket
    // only surfaced as a vacuumable orphan when `affectedKnown` was
    // passed) is exact again, for every caller. The files then MOVE into
    // `data/` by rename (metadata-only on an HDFS-like store), named
    // `<version>-<part>` so no publish can collide with another. Bonus
    // over the r16 shape: the before/after bucket-file diff is gone
    // entirely — the new-file set IS the renamed set, zero `data/`
    // listings on the publish hot path (guide §6: listing cost).
    val fs = fsOf(spark, root)
    val staging = new Path(s"$root/.staging-$version")
    fs.delete(staging, true)
    merged.write.mode("overwrite").partitionBy(bucketCol)
      .parquet(staging.toString)
    val stagedDirs = fs.listStatus(staging).filter(_.isDirectory)
      .map(_.getPath.getName + "/").toSet
    require(stagedDirs.subsetOf(prefixes),
      s"a delta publish must only write under its affected buckets " +
        s"(stray partitions: ${(stagedDirs -- prefixes).take(3).mkString(", ")})")
    val newFiles = stagedDirs.toSeq.sorted.flatMap { pre =>
      val destDir = new Path(s"${dataPath(root)}/${pre.stripSuffix("/")}")
      fs.mkdirs(destDir)
      fs.listStatus(new Path(staging, pre.stripSuffix("/")))
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map { st =>
          val name = s"$version-${st.getPath.getName}"
          require(fs.rename(st.getPath, new Path(destDir, name)),
            s"staged-file move failed: ${st.getPath}")
          pre + name
        }
    }
    fs.delete(staging, true)
    writeManifest(spark, root, version, carried ++ newFiles)
  }

  /** Metadata-only version: `version` references exactly `prevVersion`'s
    * files (a trigger that changed nothing still advances the chain so
    * version names stay aligned with trigger ids). CAS-checked like any
    * publish; no data file is written, moved or copied. */
  def publishCarry(spark: SparkSession, root: String, prevVersion: String,
      version: String): Unit = {
    val head = listVersions(spark, root).lastOption
    require(head.contains(prevVersion),
      s"stale publish: prepared against $prevVersion but head is $head")
    writeManifest(spark, root, version, readManifest(spark, root, prevVersion))
  }

  /** Read one version: exactly its manifest's files, nothing else — an
    * explicit-schema, explicit-file-list read (the manifest IS the scan's
    * file index; no directory listing, no footer discovery pass). */
  def readVersion(spark: SparkSession, root: String, version: String,
      schema: String): DataFrame = {
    val files = readManifest(spark, root, version)
    spark.read.schema(schema)
      .option("basePath", dataPath(root))
      .parquet(files.map(f => s"${dataPath(root)}/$f"): _*)
  }

  /** Read ONLY `buckets`' rows of a version — manifest-pruned to the
    * named partitions before any file is opened (the point-lookup read
    * the bucketed frontier state serves its anti-joins from: a trigger
    * reads the buckets its keys hash into, never the whole state).
    * Buckets with no files yet contribute nothing; if none of the
    * named buckets has files, returns an empty frame of `schema`. */
  def readVersionBuckets(spark: SparkSession, root: String, version: String,
      schema: String, bucketCol: String, buckets: Set[Long]): DataFrame = {
    val prefixes = buckets.map(b => s"$bucketCol=$b/")
    val files = readManifest(spark, root, version)
      .filter(f => prefixes.exists(f.startsWith))
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(schema))
    else spark.read.schema(schema)
      .option("basePath", dataPath(root))
      .parquet(files.map(f => s"${dataPath(root)}/$f"): _*)
  }

  /**
   * Snapshot expiry + orphan-file cleanup in one reachability sweep:
   * keep `retain`'s manifests, delete every other manifest, and delete
   * every data file no retained manifest references. THROWS before
   * deleting anything if a retained manifest names a missing file (a
   * corrupt chain must fail the GC, not be "cleaned" deeper). Returns
   * the deleted data files (relative paths) for auditing.
   */
  def vacuum(spark: SparkSession, root: String, retain: Seq[String]): Seq[String] = {
    require(retain.nonEmpty, "refusing to vacuum every version")
    val fs = fsOf(spark, root)
    val reachable = retain.flatMap(readManifest(spark, root, _)).toSet
    val all = listDataFiles(spark, root)
    val missing = reachable -- all
    require(missing.isEmpty,
      s"retained manifests reference missing files: ${missing.take(3).mkString(", ")}")
    val orphans = (all -- reachable).toSeq.sorted
    orphans.foreach(f => fs.delete(new Path(s"${dataPath(root)}/$f"), false))
    (listVersions(spark, root).toSet -- retain).foreach(v =>
      fs.delete(manifestPath(root, v), false))
    orphans
  }

  // ------------------------------------------------------------ branches
  // BRANCH REFS — named pointers into the version chain (Iceberg branch
  // refs / git's refs/heads): `refs/<branch>` holds one version name.
  // Because versions are manifests over SHARED immutable files, two
  // branches pointing at different versions cost nothing beyond the
  // files that genuinely differ — which is what makes write-audit-
  // publish (w21) safe: a staged version is fully materialized and
  // auditable on its own branch while every `main` reader keeps
  // resolving the old head, and PROMOTION is one ref move (metadata
  // only, no data files written or copied).

  private def refPath(root: String, branch: String) =
    new Path(s"$root/refs/$branch.ref")

  /** The version `refs/<branch>` points at, if the branch exists. */
  def branchHead(spark: SparkSession, root: String, branch: String): Option[String] = {
    val fs = fsOf(spark, root)
    val p = refPath(root, branch)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      finally in.close()
    }
  }

  /** Point `branch` at `version`; the version's manifest must exist
    * (a ref to a missing manifest would be a corrupt chain by fiat). */
  def setBranch(spark: SparkSession, root: String, branch: String,
      version: String): Unit = {
    val fs = fsOf(spark, root)
    require(fs.exists(manifestPath(root, version)),
      s"cannot point branch '$branch' at missing version '$version'")
    val out = fs.create(refPath(root, branch), true)
    try out.write((version + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Compare-and-swap promotion: move `branch` from `expected` to
    * `version` as a METADATA-ONLY commit. THROWS if the branch no longer
    * points at `expected` (a concurrent promote must fail loudly, not
    * silently drop the interleaved move — the publishDelta CAS, at the
    * ref tier). */
  def fastForward(spark: SparkSession, root: String, branch: String,
      expected: String, version: String): Unit = {
    val head = branchHead(spark, root, branch)
    require(head.contains(expected),
      s"stale promote: branch '$branch' is at $head, expected '$expected'")
    setBranch(spark, root, branch, version)
  }

  /** Remove a branch ref (an aborted audit). The versions it pointed at
    * stay on disk until a [[vacuum]] expires them — dropping a ref is
    * instant and reversible, GC is a separate, deliberate sweep. */
  def dropBranch(spark: SparkSession, root: String, branch: String): Unit =
    fsOf(spark, root).delete(refPath(root, branch), false)
}
