package graft.operators

import org.apache.hadoop.fs.{FileContext, Path => HPath}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** The MATERIALIZED cross-snapshot dedup index store — the artifact
  * n85's scaladoc names: successive crawls probe the ACCUMULATED
  * corpus's indexes, so a production pipeline writes them once per
  * snapshot and serves every later ingest from the store instead of
  * re-deriving corpus-sized lineage per run (the n79/s33 move applied
  * to the snapshot family).
  *
  * Layout under `dir/` (all plain parquet):
  *   MANIFEST.v{N}             manifest version N: committed append
  *                             ids, one per line, in commit order,
  *                             followed by `#tombstone <id>` lines for
  *                             ids compacted away (see TOMBSTONES).
  *                             The CURRENT state is the highest N
  *                             (readers resolve ONLY through it — the
  *                             file layout is the contract, not who
  *                             wrote it). [[gcOrphans]] trims old
  *                             versions past a retention floor.
  *   appends/<id>/.INFLIGHT    staging marker: present from [[stage]]
  *                             until the id's [[commit]] publishes —
  *                             [[gcOrphans]] must not sweep a marked
  *                             dir younger than its grace age.
  *   appends/<id>/sets/        (did, sset)      one row per doc
  *   appends/<id>/bands/       (did, band, key) the LSH banding index
  *   appends/<id>/digests/     (h)              DISTINCT exact md5 DELTA
  *   appends/<id>/fps/         (fp)             DISTINCT fingerprint DELTA
  *   appends/<id>/docs/        (did, lang, text) the CURATED CORPUS
  *                             increment itself (optional — written
  *                             when the caller passes `persistDocs`,
  *                             as [[Curation.cycleAppend]] does): the
  *                             store then holds the shipped corpus,
  *                             not just its indexes.
  *   appends/<id>/.summary/    audit-pruning sidecar: `baseline` (the
  *                             manifest ids the staging anti-joins ran
  *                             against) and `did.bloom` (a Bloom
  *                             filter over the append's sets∪docs doc
  *                             ids) — lets [[commit]]'s audit scan
  *                             racers and Bloom-hit appends only,
  *                             instead of the whole store per commit.
  *
  * CRASH ATOMICITY — the Publish.scala write-audit-publish discipline
  * at append granularity: [[stage]] writes all component deltas under
  * a fresh `appends/<id>/` directory that no reader resolves (readers
  * union only manifest-listed appends), [[commit]] AUDITS the staged
  * bytes as they exist on disk (the distinct-digest invariant: staged
  * digest/fp deltas must be disjoint from the committed store —
  * exactly the property the probe joins rely on — and the staged doc
  * ids must be disjoint from the committed sets AND docs components:
  * the distinct-doc-ids caller contract, enforced even for docs too
  * short to shingle), and only then publishes a NEW manifest
  * version. A crash at ANY point before the publish leaves the store
  * readable at the previous manifest; the orphaned staging directory
  * is invisible and is GC'd once its `.INFLIGHT` marker ages out. A
  * crash AFTER the publish is equally safe to retry: [[commit]] is
  * idempotent — an id already in the manifest (or tombstoned by a
  * later compaction) early-returns without re-auditing (re-auditing
  * would see the id's own committed rows as overlap and must never be
  * allowed to touch a published directory — ADVICE r17).
  *
  * OPTIMISTIC CONCURRENCY (the versioned-manifest protocol every real
  * manifest-based table format uses): a commit never overwrites the
  * manifest. It reads the current version N, audits against exactly
  * that state, and publishes MANIFEST.v{N+1} with a CREATE-IF-ABSENT
  * rename ([[publishOnce]] — atomic on HDFS; an object-store
  * deployment swaps in its conditional put, the same trade [[Publish]]
  * documents). Only one writer can claim a given version, so a commit
  * that lands is provably derived from the state it audited against; a
  * losing racer's rename fails, and it RETRIES — re-reads the new
  * state, re-checks idempotence, re-audits its staged bytes against
  * the winner's rows — so two racing non-overlapping appends BOTH
  * commit (no lost append id), while a racing append whose staged
  * delta now overlaps the winner's content fails its re-audit and is
  * rejected instead of silently breaking one-row-per-distinct-value.
  *
  * COMPACTION ([[compact]]): reads pay O(appends) manifest+listing
  * metadata per component scan, so after many crawl-cycle appends the
  * store is rewritten into ONE append through the same
  * stage→audit→publish protocol — the audit here is the append==rebuild
  * row-multiset equality itself (count + EXCEPT ALL per component,
  * O(corpus) like the rewrite it guards), and the publish preserves any
  * append that raced in after the compactor captured its sources.
  * Superseded append directories become unlisted and [[gcOrphans]]
  * reclaims them.
  *
  * TOMBSTONES (the replay guard [[appendAs]] needs): [[compact]]
  * records every id it supersedes as a `#tombstone <id>` manifest line,
  * carried forward by every later publish. A REPLAYED keyed append
  * ([[appendAs]] — s42's per-micro-batch (increment, batch-id) key)
  * whose id was compacted out of the manifest therefore still
  * recognizes itself as committed and NO-OPS, instead of re-staging
  * and double-appending its sets/bands rows — the r18 "do not compact
  * while a keyed stream is live" scaladoc rule, now an enforced
  * property (a compaction during a live increment remains
  * NOT recommended purely for snapshot-pinning hygiene, but it no
  * longer corrupts the store on replay). Tombstones are one manifest
  * line per ever-compacted id — bytes, not data — each stamped with
  * the manifest version that created it (`#tombstone@<v> <id>`; legacy
  * unversioned lines parse as version 0); [[gcOrphans]]'s
  * `tombstoneRetention` drops tombstones older than a configured
  * version horizon, since a replay can only reach back as far as a
  * streaming checkpoint exists.
  *
  * APPEND == REBUILD (SnapshotStoreSpec proves it across 3 chunks):
  * sets/bands/docs rows are per-doc and banding is per-row
  * deterministic (the shared [[MinHashLsh.bandKeysFromSig]] kernel),
  * so appending N snapshots yields exactly the rebuild's row multiset;
  * the digest components keep their one-row-per-distinct-value
  * invariant by anti-joining each snapshot's digests against the
  * COMMITTED store before the staged write — and because the write
  * lands in the staging directory, the job never scans a path it is
  * writing into (no localCheckpoint pinning executor block storage —
  * the r16 trade, resolved by the staging itself).
  *
  * READER STALENESS (ADVICE r18): a pinned [[Snapshot]] that outlives
  * a [[gcOrphans]] sweep of its superseded dirs fails LOUDLY — a
  * referenced append dir that no longer exists throws a stale-snapshot
  * error instead of silently serving partial rows (dir present but
  * empty stays a legal, invisible empty delta). The no-GC-while-pinned
  * rule is still the operational discipline; violating it is now an
  * error, not a wrong answer.
  *
  * Scale — the full lifecycle cost in ONE statement (VERDICT r20 #4):
  * STAGE is O(delta + sketch-hit appends): one scan of the NEW
  * snapshot per component (sets/docs map-side; bands from the written
  * sets bytes; digests/fps as map-side-combined distinct CANDIDATE
  * writes), one aggregation pass over the staged bytes that builds
  * the `.summary` sketches and tests every staged key against the
  * pinned appends' sketches, and an anti-join that scans ONLY the
  * sketch-hit (or sketch-less legacy) appends — disjoint snapshots,
  * the common crawl case, never scan the committed store at all
  * (before r21 the staging anti-join's build side was the WHOLE
  * committed component per append). COMMIT is O(delta) and jobless in
  * the no-race case: digest/fp conflicts are checked only against
  * sketch-hit appends committed after the staging's recorded baseline
  * (`.summary/baseline`), and the doc-id contract's baseline half is
  * the stage-recorded `.summary/did.hits` verdict — only racers (or a
  * legacy staging) pay a sketch-test job, and only possible hits are
  * scan-confirmed. Serving is stateless equi-joins against
  * (multi-path) file scans — no corpus-sized state, no broadcast
  * assumption anywhere; a corpus-sized serve probe can additionally
  * pre-filter the store side with a probe-key Bloom (guide §3.2) when
  * the store dwarfs the arriving batch. */
object SnapshotStore {

  private def hfs(spark: SparkSession, p: HPath) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val ManifestRe = """MANIFEST\.v(\d+)""".r
  private val TombstoneRe = """#tombstone (.+)""".r
  private val TombstoneVRe = """#tombstone@(\d+) (.+)""".r

  /** Append ids are manifest LINES and path components — free text
    * within those constraints, validated at staging time (ADVICE r19:
    * an id starting with `#` would commit, then silently vanish from
    * [[Manifest.ids]] on the next read as a tombstone/comment line,
    * orphaning its committed rows; newlines would corrupt the
    * manifest; path separators would nest the staging dir outside
    * [[gcOrphans]]'s listing). */
  private[graft] def requireValidId(aid: String): Unit =
    require(aid.nonEmpty && aid.trim == aid &&
      !aid.startsWith("#") && !aid.startsWith(".") &&
      !aid.exists(c => c == '\n' || c == '\r' || c == '/' || c == '\\') &&
      !ManifestRe.pattern.matcher(aid).matches(),
      s"SnapshotStore append id '$aid' is invalid: ids must be non-empty " +
        "and trimmed, must not start with '#' or '.', must not contain " +
        "newlines or path separators, and must not match the " +
        "MANIFEST.v<N> pattern")

  /** The staging marker [[gcOrphans]]'s grace rule keys on. */
  private val InflightMarker = ".INFLIGHT"

  /** (Re)create the staging marker, refreshing its mtime — [[stage]]
    * writes it first; [[commit]]/[[compact]] touch it as they work so
    * a long audit/publish keeps its grace protection alive (the
    * staging writes themselves refresh the component dirs' mtimes,
    * which [[gcOrphans]]'s age rule also considers). */
  private def touchInflight(spark: SparkSession, base: String): Unit = {
    val m = new HPath(s"$base/$InflightMarker")
    hfs(spark, m).create(m, true).close()
  }

  /** Grace age for marked (in-flight) staging dirs — [[gcOrphans]]
    * refuses to sweep a younger marked dir, so a sweep racing a live
    * [[stage]] can no longer eat it (VERDICT r18 #2a). A crashed stage
    * is reclaimed once its marker ages past this. */
  val DefaultGcGraceMs: Long = 15L * 60 * 1000

  /** Manifest versions kept by [[gcOrphans]]'s history trim — the
    * retention floor a pinned reader (or a replayed keyed append
    * resolving tombstones) can rely on. */
  val DefaultKeepManifests: Int = 10

  /** One parsed manifest version: committed ids in commit order plus
    * the tombstoned (compacted-away) ids every publish carries
    * forward, each mapped to the manifest version that CREATED it
    * (`#tombstone@<v> <id>` lines; legacy unversioned `#tombstone
    * <id>` lines parse as version 0 — the oldest possible, first to
    * age out under a retention horizon). (version 0, empty, empty)
    * before the first commit. */
  final case class Manifest(version: Long, ids: Seq[String],
      tombstones: Map[String, Long])

  /** Parse the CURRENT manifest — the highest MANIFEST.v{N} present.
    * Readers resolve ONLY its ids. */
  private[graft] def currentManifest(spark: SparkSession,
      dir: String): Manifest = {
    val d = new HPath(dir)
    val fs = hfs(spark, d)
    if (!fs.exists(d)) Manifest(0L, Seq.empty, Map.empty)
    else {
      val versions = fs.listStatus(d).toSeq.map(_.getPath.getName)
        .collect { case ManifestRe(n) => n.toLong }
      if (versions.isEmpty) Manifest(0L, Seq.empty, Map.empty)
      else {
        val v = versions.max
        val in = fs.open(new HPath(s"$dir/MANIFEST.v$v"))
        val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().map(_.trim).filter(_.nonEmpty).toVector
        finally in.close()
        Manifest(v, lines.filterNot(_.startsWith("#")),
          lines.collect {
            case TombstoneVRe(tv, id) => id -> tv.toLong
            case TombstoneRe(id) => id -> 0L
          }.toMap)
      }
    }
  }

  /** Committed append ids, in commit order (empty before the first
    * successful commit). */
  def committedIds(spark: SparkSession, dir: String): Seq[String] =
    currentManifest(spark, dir).ids

  /** True once at least one append has committed. */
  def nonEmpty(spark: SparkSession, dir: String): Boolean =
    committedIds(spark, dir).nonEmpty

  /** A component dir contributes to a scan only if a task actually
    * wrote a part file there (an all-rows-deduped digest delta writes
    * none — the empty delta is a legal, invisible component; so is an
    * append staged without the optional docs component). */
  private def hasParquet(spark: SparkSession, p: String): Boolean = {
    val hp = new HPath(p)
    val fs = hfs(spark, hp)
    fs.exists(hp) &&
      fs.listStatus(hp).exists(_.getPath.getName.endsWith(".parquet"))
  }

  /** Every component a store may hold, in staging order — the single
    * registry specs and [[compact]] iterate (docs is optional per
    * append: only `persistDocs` writers stage it). */
  val Components: Seq[String] = Seq("sets", "bands", "digests", "fps", "docs")

  /** Current-manifest component read by name (spec/tooling surface —
    * the typed readers below are the API). */
  def componentByName(spark: SparkSession, dir: String,
      comp: String): DataFrame = {
    require(Components.contains(comp), s"unknown component $comp")
    readComponent(spark, dir, comp)
  }

  /** Resolve `ids`' component dirs, distinguishing the two absence
    * modes (ADVICE r18): a missing APPEND dir means the manifest view
    * references a reclaimed append — a stale pinned snapshot, a LOUD
    * error, never a silent partial read — while a present append whose
    * COMPONENT dir is missing or holds no part file is a legal empty
    * delta and is skipped. The append-dir probe runs ONLY in the
    * no-parquet (ambiguous) case, so the hot path — a component with
    * data — pays exactly the old exists+listStatus, not an extra RPC
    * per id per component. */
  private def componentPaths(spark: SparkSession, dir: String,
      ids: Seq[String], comp: String): Seq[String] =
    ids.flatMap { id =>
      val adir = s"$dir/appends/$id"
      val cp = s"$adir/$comp"
      if (hasParquet(spark, cp)) Some(cp)
      else if (!hfs(spark, new HPath(adir)).exists(new HPath(adir)))
        throw new IllegalStateException(
          s"SnapshotStore view of $dir is STALE: committed append dir " +
            s"$adir no longer exists (reclaimed by gcOrphans while this " +
            "snapshot was pinned?) — re-resolve a current snapshot")
      else None
    }

  /** READER SNAPSHOT ISOLATION — an immutable view of the store at ONE
    * manifest version. Every multi-component consumer ([[serveNearDup]]
    * needs bands+sets, [[serveDelta]] digests+fps, the crawl cycle's
    * policy gate digests+fps) resolves the manifest ONCE through
    * [[SnapshotStore.snapshot]] and reads all its components from the
    * same committed id set: without the pin, each component read
    * re-resolves the CURRENT manifest, so a commit or compaction
    * landing between two reads of one logical query would serve it a
    * torn store (digests at version N, fps at N+1 — or, after a
    * compaction, paths from two generations of the same rows). The
    * append dirs a snapshot references are immutable once committed
    * and only [[gcOrphans]] deletes them, so a pinned snapshot stays
    * readable under any number of later commits/compactions; if GC
    * does reclaim a referenced dir, the next component read throws a
    * stale-snapshot error instead of silently returning partial rows
    * (the grace-period discipline every manifest-based table format
    * pairs with optimistic concurrency — now failure-checked). */
  final case class Snapshot(dir: String, version: Long, ids: Seq[String]) {
    private[operators] def component(spark: SparkSession,
        comp: String): DataFrame = {
      val paths = componentPaths(spark, dir, ids, comp)
      require(paths.nonEmpty,
        s"SnapshotStore at $dir has no committed $comp rows (version $version)")
      // digests/fps schemas are static; for the did-typed components a
      // per-(store, component) schema cache applies: append==rebuild
      // already requires every append's component to be
      // union-compatible (a plain multi-path read picks ONE file's
      // footer schema anyway), so the first read's inferred schema
      // serves every later read — skipping the parquet
      // schema-inference job each probe/serve used to launch per
      // component (s42 pays it per micro-batch)
      if (comp == "digests") spark.read.schema(DigestSchema).parquet(paths: _*)
      else if (comp == "fps") spark.read.schema(FpSchema).parquet(paths: _*)
      else spark.read
        .schema(SnapshotStore.cachedComponentSchema(spark, dir, comp, paths))
        .parquet(paths: _*)
    }
    def sets(spark: SparkSession): DataFrame = component(spark, "sets")
    def bands(spark: SparkSession): DataFrame = component(spark, "bands")
    def digests(spark: SparkSession): DataFrame = component(spark, "digests")
    def fps(spark: SparkSession): DataFrame = component(spark, "fps")
    def docs(spark: SparkSession): DataFrame = component(spark, "docs")
  }

  /** Backing cache for [[Snapshot.component]]'s schema reuse — keyed
    * (dir, comp); a store's component schema is fixed by the append ==
    * rebuild union-compatibility contract. LRU-bounded (a long-lived
    * JVM cycling many temp stores must not grow it without bound —
    * VERDICT r21 #4), and [[gcOrphans]] invalidates a dir's entries so
    * deleting a store and recreating one at the same path with a
    * different docs schema cannot be served the stale cached schema
    * (ADVICE r21). */
  private val SchemaCacheCap = 1024
  private val componentSchemaCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, String),
        org.apache.spark.sql.types.StructType](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String),
            org.apache.spark.sql.types.StructType]): Boolean =
        size > SchemaCacheCap
    })
  private def invalidateSchemas(dir: String): Unit =
    componentSchemaCache.synchronized {
      componentSchemaCache.keySet.removeIf(_._1 == dir)
    }
  /** The (dir, comp) schema, inferred once from `paths` and cached —
    * sound because append == rebuild requires every append's component
    * to be union-compatible. */
  private def cachedComponentSchema(spark: SparkSession, dir: String,
      comp: String,
      paths: => Seq[String]): org.apache.spark.sql.types.StructType = {
    val key = (dir, comp)
    val cached = componentSchemaCache.get(key)
    if (cached != null) cached
    else {
      val schema = spark.read.parquet(paths: _*).schema
      componentSchemaCache.put(key, schema)
      schema
    }
  }

  /** Resolve the CURRENT manifest once into an immutable [[Snapshot]]
    * view — the version every component read of one logical query
    * should share. */
  def snapshot(spark: SparkSession, dir: String): Snapshot = {
    val m = currentManifest(spark, dir)
    Snapshot(dir, m.version, m.ids)
  }

  private def readComponent(spark: SparkSession, dir: String,
      comp: String): DataFrame =
    snapshot(spark, dir).component(spark, comp)

  // ------------------------------------------------------------------
  // Per-append AUDIT SUMMARY sidecar (`appends/<id>/.summary/`) — the
  // pruning layout that makes BOTH halves of the lifecycle O(delta +
  // bloom-hit appends), not O(store) (VERDICT r19 #2 closed the commit
  // half in r20; r21 closes the stage half with the same mechanism):
  //   baseline      the pinned manifest ids the staging ran against —
  //                 the commit's digest/fp audit only scans appends
  //                 committed AFTER it (the racers; no race ⇒ none);
  //   did.bloom     [[StoreSketch]] over the append's sets∪docs doc ids;
  //   digest.bloom  [[StoreSketch]] over the append's digest delta keys
  //                 (built over the PRE-anti-join candidate rows — a
  //                 covering superset of the final delta, which only
  //                 adds false positives, never misses);
  //   fp.bloom      same for the fingerprint delta;
  //   did.hits      the baseline appends whose did sketch HIT a staged
  //                 did (plus sketch-less baseline appends) — recorded
  //                 at stage time so the no-race commit scan-confirms
  //                 exactly these and launches ZERO jobs when empty.
  // All sketches are built in ONE aggregation pass over the staged
  // BYTES (audit the bytes, not the producing plan), which in the same
  // pass tests every key against the pinned appends' sketches — the
  // r20 layout paid a count job + a bloom job per append and a
  // sketch-test job per commit. Bloom false positives cost a
  // confirming scan, never a wrong verdict; a MISSING sidecar (or a
  // missing did.hits) falls back to the unpruned scan for that append
  // — conservative, identical detection power.
  // ------------------------------------------------------------------

  private val SummaryDir = ".summary"

  /** Sidecar file per sketch family: `did` = sets∪docs doc ids, `dig` =
    * digest delta keys, `fp` = fingerprint delta keys, `band` = the
    * append's LSH (band, key) pairs tagged `band|key` — the serve-probe
    * pruning key ([[serveNearDup]]): an arriving doc can only near-dup
    * a stored doc whose append shares one of its band keys. */
  private val FamFile = Map(
    "did" -> "did.bloom", "dig" -> "digest.bloom", "fp" -> "fp.bloom",
    "band" -> "band.bloom")

  /** The tagged band-sketch key — ONE encoding shared by the sidecar
    * build (stage/compact) and the serve probe, so a stored (band, key)
    * equal to an arriving one always hits (no false negatives; a rare
    * cross-band string collision only adds a spurious scanned append). */
  private def bandSketchKey(band: Column, key: Column): Column =
    concat(band.cast("string"), lit("|"), key)

  /** The single-column digest/fp component schemas — known statically,
    * so their reads always pass an explicit schema (skips the parquet
    * schema-inference job and its driver gap on every hot-path read). */
  private val DigestSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("h",
      org.apache.spark.sql.types.StringType)))
  private val FpSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("fp",
      org.apache.spark.sql.types.StringType)))
  /** The (band, key) projection of the bands component — static (the
    * [[MinHashLsh.banded]] kernel types them), so band-sketch scans
    * prune to these two columns and skip schema inference. */
  private val BandKeySchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("band",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("key",
      org.apache.spark.sql.types.StringType)))

  /** The component dirs whose presence makes a family auditable for an
    * append that has NO sketch (the conservative must-scan fallback). */
  private def famComponentPresent(spark: SparkSession, dir: String,
      id: String, fam: String): Boolean = fam match {
    case "did" => Seq("sets", "docs").exists(c =>
      hasParquet(spark, s"$dir/appends/$id/$c"))
    case "dig" => hasParquet(spark, s"$dir/appends/$id/digests")
    case "fp" => hasParquet(spark, s"$dir/appends/$id/fps")
    case "band" => hasParquet(spark, s"$dir/appends/$id/bands")
  }

  private def writeBaseline(spark: SparkSession, base: String,
      pinned: Snapshot): Unit = {
    val p = new HPath(s"$base/$SummaryDir/baseline")
    val out = hfs(spark, p).create(p, true)
    try out.write((pinned.version.toString +: pinned.ids)
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** The staged append's recorded anti-join baseline ids — None for a
    * pre-summary staging (audit falls back to all committed ids). */
  private def readBaseline(spark: SparkSession,
      base: String): Option[Seq[String]] = {
    val p = new HPath(s"$base/$SummaryDir/baseline")
    val fs = hfs(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().map(_.trim).filter(_.nonEmpty).toVector
      finally in.close()
      Some(lines.drop(1)) // line 1 = pinned version
    }
  }

  /** Stage-recorded did-audit hit list (`did.hits`): the baseline
    * appends the commit must scan-confirm for a shared doc id. An
    * EMPTY file is a valid "no possible hit" verdict; an ABSENT file
    * (legacy staging) makes the commit fall back to testing every
    * committed append's sketch. Ids are one per line (valid ids never
    * contain newlines — [[requireValidId]]). */
  private def writeDidHits(spark: SparkSession, base: String,
      ids: Seq[String]): Unit = {
    val p = new HPath(s"$base/$SummaryDir/did.hits")
    val out = hfs(spark, p).create(p, true)
    try out.write(ids.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def readDidHits(spark: SparkSession,
      base: String): Option[Seq[String]] = {
    val p = new HPath(s"$base/$SummaryDir/did.hits")
    val fs = hfs(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().map(_.trim).filter(_.nonEmpty).toVector)
      finally in.close()
    }
  }

  private def writeSketchFile(spark: SparkSession, path: String,
      sk: StoreSketch): Unit = {
    val p = new HPath(path)
    val out = hfs(spark, p).create(p, true)
    try StoreSketch.write(out, sk) finally out.close()
  }

  private def readSketchFile(spark: SparkSession,
      path: String): Option[StoreSketch] = {
    val p = new HPath(path)
    val fs = hfs(spark, p)
    if (!fs.exists(p)) None
    else {
      // an unreadable/foreign sidecar (an r20-era Spark-BloomFilter
      // file, a torn write, a future format) degrades to "no sketch:
      // scan this append" — the same conservative must-scan fallback a
      // MISSING sidecar takes; it must never crash the stage/commit
      // that touches a store with legacy appends (ADVICE r21)
      try {
        val in = fs.open(p)
        try Some(StoreSketch.read(in)) finally in.close()
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(
            s"[SnapshotStore] unreadable sketch sidecar $path " +
              s"(${e.getMessage}) — falling back to unpruned scan")
          None
      }
    }
  }

  /** JVM cache of COMMITTED appends' sidecar sketches — sound because
    * an append dir is immutable once committed (only [[gcOrphans]]
    * ever deletes it, and gc INVALIDATES the ids it reclaims, so a
    * recycled id can never serve a stale sketch — ADVICE r20).
    * Without it, a keyed stream (s42) re-reads every committed sketch
    * on every micro-batch — O(batches × appends) sidecar reads instead
    * of O(appends). Absence (a legacy pre-summary append) is cached
    * too: it can never become present after commit. Bounded by LRU
    * eviction (VERDICT r20 #2 — the r20 cache cleared WHOLESALE past
    * 256 entries, thrashing exactly on the hot path it served): a
    * store held past the cap re-reads only its least-recently-used
    * sidecars, never the whole set per commit. */
  private val SketchCacheCap = 4096
  private val sketchCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, String, String),
        Option[StoreSketch]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String, String),
            Option[StoreSketch]]): Boolean = size > SketchCacheCap
    })
  private def cachedSketch(spark: SparkSession, dir: String, id: String,
      fam: String): Option[StoreSketch] = {
    val key = (dir, id, fam)
    val hit = sketchCache.get(key)
    if (hit != null) hit
    else {
      val loaded = readSketchFile(spark,
        s"$dir/appends/$id/$SummaryDir/${FamFile(fam)}")
      sketchCache.put(key, loaded)
      loaded
    }
  }
  /** Drop cache entries for reclaimed append dirs (called by
    * [[gcOrphans]]) — keyed-id recycling after a tombstone-retention
    * trim must never consult a stale sketch. */
  private def invalidateSketches(dir: String, ids: Seq[String]): Unit = {
    val gone = ids.toSet
    sketchCache.synchronized {
      sketchCache.keySet.removeIf(k => k._1 == dir && gone(k._2))
    }
  }

  /** Conf: committed-component bytes at which a serve probe starts
    * paying ONE aggregation pass over the ARRIVING batch to sketch-test
    * it against every append's sidecar and scan only the hit appends
    * (guide §3.2 — the store side of the join is pre-filtered before
    * any scan/exchange, by FILE PRUNING rather than a per-row filter).
    * The default (64 MiB) is far above any fixture store — the bench's
    * serve plans are byte-identical — and far below one production
    * crawl increment, where the accumulated store dwarfs an arriving
    * probe batch and the pass over the batch is the cheap side by
    * construction. Set to 0 to force pruning on (the equality/metrics
    * specs do), or negative to disable outright. */
  val ServePruneConfKey = "graft.store.servePruneMinBytes"
  val DefaultServePruneMinBytes: Long = 64L * 1024 * 1024
  private def servePruneMinBytes(spark: SparkSession): Long =
    spark.conf.getOption(ServePruneConfKey).map(_.toLong)
      .getOrElse(DefaultServePruneMinBytes)

  /** JVM cache of per-(dir, id, comp) committed parquet byte totals —
    * the serve-prune gate's input. Sound for the same reason as the
    * sketch cache (append dirs are immutable once committed; gc
    * invalidates reclaimed ids); without it every serve probe of a
    * keyed stream re-lists O(appends) directories per micro-batch. */
  private val BytesCacheCap = 8192
  private val bytesCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, String, String),
        java.lang.Long](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String, String),
            java.lang.Long]): Boolean = size > BytesCacheCap
    })
  private def invalidateBytes(dir: String, ids: Seq[String]): Unit = {
    val gone = ids.toSet
    bytesCache.synchronized {
      bytesCache.keySet.removeIf(k => k._1 == dir && gone(k._2))
    }
  }
  /** Total parquet bytes of `ids`' `comp` dirs — driver metadata only,
    * cached per committed append. */
  private def componentBytes(spark: SparkSession, dir: String,
      ids: Seq[String], comp: String): Long =
    ids.map { id =>
      val key = (dir, id, comp)
      val hit = bytesCache.get(key)
      if (hit != null) hit.longValue()
      else {
        val p = new HPath(s"$dir/appends/$id/$comp")
        val fs = hfs(spark, p)
        val n =
          if (!fs.exists(p)) 0L
          else fs.listStatus(p).toSeq
            .filter(_.getPath.getName.endsWith(".parquet"))
            .map(_.getLen).sum
        bytesCache.put(key, java.lang.Long.valueOf(n))
        n
      }
    }.sum

  /** The build-buffer width for sketch aggregation (folded down to
    * ~16 bits/key before persisting). Conf-tunable for production
    * increment sizes ([[StoreSketch.CapConfKey]]), validated against
    * the Int-indexed position math's envelope (VERDICT r21 #2: a conf
    * ≥ 32 used to allocate a wrongly-sized words array and die with
    * ArrayIndexOutOfBounds inside tasks instead of failing fast). */
  private def capLog2(spark: SparkSession): Int = {
    val cap = spark.conf.getOption(StoreSketch.CapConfKey).map(_.toInt)
      .getOrElse(StoreSketch.DefaultCapBitsLog2)
    require(cap >= StoreSketch.MinBitsLog2 &&
        cap <= StoreSketch.MaxBitsLog2,
      s"${StoreSketch.CapConfKey}=$cap out of range " +
        s"[${StoreSketch.MinBitsLog2}, ${StoreSketch.MaxBitsLog2}]: the " +
        "sketch position math is Int-indexed, so widths past 2^31 bits " +
        "are not supported")
    cap
  }

  /** Per-family result of [[sketchJob]]: the built sketch (when
    * requested and the family had any input), the input key count, and
    * the committed appends whose sketch HIT at least one key. */
  private final case class SketchResult(sketch: Option[StoreSketch],
      count: Long, hitIds: Set[String])

  /** Mutable per-family aggregation buffer: the (optional) cap-width
    * sketch words, one hit flag per tested committed sketch, and the
    * key count. */
  private final class SketchBuf(val words: Array[Long],
      val flags: Array[Boolean], var count: Long,
      var remaining: Int) extends Serializable

  /** One [[sketchJob]] input: a family, the parquet paths carrying its
    * keys, the key EXPRESSION over those columns (a plain column for
    * did/dig/fp; the band family's tagged `band|key` concat), and
    * (when the caller knows it) the read schema — an explicit schema
    * prunes the scan to the key columns AND skips the parquet
    * schema-inference job a plain `spark.read.parquet` launches
    * (measured: 3 × ~60 ms + driver gaps per stage at fixture scale). */
  private final case class SketchPart(fam: String, paths: Seq[String],
      key: Column, keySchema: Option[org.apache.spark.sql.types.StructType])

  /** ONE pass over staged parquet bytes that both BUILDS the sidecar
    * sketches (at cap width, folded later) and TESTS every key against
    * the supplied committed sketches per family — replacing the r20
    * count + bloom-build + sketch-test jobs with a single
    * treeAggregate (depth 2 past 64 partitions, so corpus-scale
    * increments merge partials in a tree, not on the driver).
    *
    * Several parts may share a family (sets and docs both carry dids).
    * `fams` maps a family to the committed (appendId, sketch) pairs to
    * test; null keys are skipped (SQL join semantics: null never
    * equals — ADVICE r20's NPE on null doc ids). Families with nothing
    * to do (no sketch wanted, nothing to test) are excluded from the
    * scan; if nothing remains, NO job runs. */
  private def sketchJob(spark: SparkSession,
      parts: Seq[SketchPart],
      fams: Map[String, Seq[(String, StoreSketch)]],
      buildSketch: Boolean, cap: Int): Map[String, SketchResult] = {
    val live = parts.filter(_.paths.nonEmpty)
    val needed = live.filter(p =>
      buildSketch || fams.getOrElse(p.fam, Nil).nonEmpty)
    val empty = parts.map(_.fam).distinct
      .map(_ -> SketchResult(None, 0L, Set.empty[String])).toMap
    if (needed.isEmpty) return empty
    import spark.implicits._
    val ds = needed.map { p =>
      val reader = spark.read
      p.keySchema.foreach(reader.schema)
      reader.parquet(p.paths: _*)
        .select(lit(p.fam).as("fam"), p.key.cast("string").as("k"))
        .as[(String, String)]
    }.reduce(_ union _)
    empty ++ sketchAgg(spark, ds, fams, buildSketch, cap)
  }

  /** The aggregation half of [[sketchJob]], shared with the serve
    * probes' hit tests ([[serveNearDup]]/[[serveDelta]]): ONE treeAggregate over a
    * (family, key) dataset that builds cap-width sketches (when asked)
    * and tests every key against the supplied committed sketches. */
  private def sketchAgg(spark: SparkSession,
      ds: org.apache.spark.sql.Dataset[(String, String)],
      fams: Map[String, Seq[(String, StoreSketch)]],
      buildSketch: Boolean, cap: Int): Map[String, SketchResult] = {
    val famsBc = spark.sparkContext.broadcast(fams)
    val wordsLen = 1 << (cap - 6)
    def newBuf(fam: String): SketchBuf = {
      val n = famsBc.value.getOrElse(fam, Nil).size
      new SketchBuf(if (buildSketch) new Array[Long](wordsLen) else null,
        new Array[Boolean](n), 0L, n)
    }
    val seqOp = (acc: scala.collection.mutable.HashMap[String, SketchBuf],
        row: (String, String)) => {
      if (row._2 != null) {
        val buf = acc.getOrElseUpdate(row._1, newBuf(row._1))
        val (h1, h2) = StoreSketch.hash2(row._2)
        if (buf.words != null) StoreSketch.addHashed(buf.words, cap, h1, h2)
        buf.count += 1
        if (buf.remaining > 0) {
          val sketches = famsBc.value(row._1)
          var i = 0
          while (i < buf.flags.length && buf.remaining > 0) {
            if (!buf.flags(i) && sketches(i)._2.mightContainHashed(h1, h2)) {
              buf.flags(i) = true
              buf.remaining -= 1
            }
            i += 1
          }
        }
      }
      acc
    }
    val combOp = (a: scala.collection.mutable.HashMap[String, SketchBuf],
        b: scala.collection.mutable.HashMap[String, SketchBuf]) => {
      b.foreach { case (fam, bb) =>
        a.get(fam) match {
          case None => a(fam) = bb
          case Some(ab) =>
            if (ab.words != null && bb.words != null) {
              var i = 0
              while (i < ab.words.length) { ab.words(i) |= bb.words(i); i += 1 }
            }
            var i = 0
            var rem = 0
            while (i < ab.flags.length) {
              ab.flags(i) = ab.flags(i) || bb.flags(i)
              if (!ab.flags(i)) rem += 1
              i += 1
            }
            ab.remaining = rem
            ab.count += bb.count
        }
      }
      a
    }
    val rdd = ds.rdd
    val depth = if (rdd.getNumPartitions > 64) 2 else 1
    val agg = rdd.treeAggregate(
      scala.collection.mutable.HashMap.empty[String, SketchBuf])(
      seqOp, combOp, depth)
    famsBc.destroy()
    agg.map { case (fam, buf) =>
      val sk = if (buf.words == null) None else Some(
        new StoreSketch(cap, buf.words)
          .fold(StoreSketch.optimalBitsLog2(buf.count, cap)))
      val hits = fams.getOrElse(fam, Nil).iterator.zipWithIndex
        .collect { case ((id, _), i) if buf.flags(i) => id }.toSet
      fam -> SketchResult(sk, buf.count, hits)
    }.toMap
  }

  /** Split `ids` into (testable sketches, must-scan ids) for a family:
    * an id with a sidecar sketch is bloom-testable; one without (a
    * legacy append) must be scanned IF it has auditable bytes for the
    * family. */
  private def famSketches(spark: SparkSession, dir: String,
      ids: Seq[String], fam: String)
      : (Seq[(String, StoreSketch)], Seq[String]) = {
    val loaded = ids.map(id => id -> cachedSketch(spark, dir, id, fam))
    (loaded.collect { case (id, Some(sk)) => (id, sk) },
      loaded.collect { case (id, None) => id }
        .filter(famComponentPresent(spark, dir, _, fam)))
  }

  /** Shared driver-side pool for INDEPENDENT staging writes — Spark
    * happily runs concurrent jobs in one application (guide §2.6), so
    * the 3–4 component writes of a stage (and a compact's rewrites)
    * overlap instead of serializing their scheduling + commit floors.
    * Failure semantics match a crash mid-staging: every task settles,
    * the first error propagates, and the partial dir is recovered by
    * its `.INFLIGHT` marker aging out. */
  private lazy val stagingPool = java.util.concurrent.Executors
    .newFixedThreadPool(4,
      (r: Runnable) => {
        val t = new Thread(r, "graft-store-staging")
        t.setDaemon(true)
        t
      })
  private def inParallel(tasks: Seq[() => Unit]): Unit =
    if (tasks.size <= 1) tasks.foreach(_.apply())
    else {
      val futs = tasks.map(t => stagingPool.submit(
        new java.util.concurrent.Callable[Unit] { def call(): Unit = t() }))
      val errs = futs.flatMap(f =>
        try { f.get(); None }
        catch {
          case e: java.util.concurrent.ExecutionException =>
            Some(e.getCause)
        })
      errs.headOption.foreach(e => throw e)
    }

  /** STAGE one snapshot's index rows: every component delta is written
    * under `appends/<id>/`, which no reader resolves until [[commit]]
    * publishes the id. Doc ids must be distinct across appended
    * snapshots (caller contract, as in
    * [[MinHashLsh.snapshotNearDupPairs]] — enforced by the commit
    * audit's doc-id check). `persistDocs` additionally writes the
    * snapshot rows themselves (id column renamed `did`) as the `docs`
    * component — the curated-corpus payload. Returns the append id. */
  private[graft] def stage(spark: SparkSession, dir: String,
      snapshot: DataFrame, id: String = "doc_id", text: String = "text",
      k: Int = 32, r: Int = 2, persistDocs: Boolean = false): String =
    stageAs(spark, dir, s"append-${java.util.UUID.randomUUID()}",
      snapshot, id, text, k, r, persistDocs)

  private[graft] def stageAs(spark: SparkSession, dir: String, aid: String,
      snapshotDf: DataFrame, id: String = "doc_id", text: String = "text",
      k: Int = 32, r: Int = 2, persistDocs: Boolean = false): String = {
    requireValidId(aid)
    val base = s"$dir/appends/$aid"
    // in-flight marker FIRST: from here until commit's publish, a
    // gcOrphans sweep must leave this dir alone (grace rule)
    touchInflight(spark, base)
    // pinned BEFORE any staging write: this is the recorded baseline —
    // everything committing after it is a racer the commit audit
    // covers, so an earlier pin only widens the racer set, never
    // loses a conflict
    val pinned = snapshot(spark, dir)
    val setsDf = snapshotDf
      .select(col(id).as("did"), Text.shingleSet(col(text)).as("sset"))
      .where(size(col("sset")) > 0)
    // the component writes are INDEPENDENT Spark jobs — overlap them
    // (guide §2.6) instead of serializing 4 scheduling+commit floors.
    // digests/fps stage their full distinct CANDIDATE rows with no
    // anti-join; the sketch pass below proves which committed appends
    // could share a key, and only a hit triggers the delta rewrite —
    // the no-hit stage (disjoint snapshots, the common crawl case)
    // never scans the committed store at all.
    inParallel(Seq(
      () => {
        setsDf.write.mode("error").parquet(s"$base/sets")
        // bands derive from the WRITTEN sets bytes: the shingle kernel
        // runs once per stage, not once for sets and again for bands
        // (explicit schema: no inference job, and an empty write —
        // no part files — still reads as the empty frame)
        val setsBack = spark.read.schema(setsDf.schema)
          .parquet(s"$base/sets")
        MinHashLsh.banded(setsBack, k, r).write.mode("error")
          .parquet(s"$base/bands")
      },
      () => snapshotDf.select(md5(col(text)).as("h")).distinct()
        .write.mode("error").parquet(s"$base/digests"),
      () => snapshotDf.select(Text.fingerprint(col(text)).as("fp"))
        .distinct().write.mode("error").parquet(s"$base/fps")) ++
      (if (persistDocs)
        Seq(() => snapshotDf.withColumnRenamed(id, "did")
          .write.mode("error").parquet(s"$base/docs"))
      else Seq.empty))
    // ONE aggregation pass over the staged BYTES (audit the bytes, not
    // the producing plan): builds did/digest/fp sidecar sketches AND
    // tests every staged key against the pinned appends' sketches
    val fams = Seq("did", "dig", "fp").map(f =>
      f -> famSketches(spark, dir, pinned.ids, f)).toMap
    val didSchema = Some(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("did",
        setsDf.schema("did").dataType))))
    val parts = Seq(
      SketchPart("did", Seq(s"$base/sets").filter(hasParquet(spark, _)),
        col("did"), didSchema),
      SketchPart("did", Seq(s"$base/docs").filter(hasParquet(spark, _)),
        col("did"), didSchema),
      SketchPart("dig", Seq(s"$base/digests").filter(hasParquet(spark, _)),
        col("h"), Some(DigestSchema)),
      SketchPart("fp", Seq(s"$base/fps").filter(hasParquet(spark, _)),
        col("fp"), Some(FpSchema)),
      // band sketch: the serve-probe pruning sidecar (nothing tests
      // against it at stage time — bands have no disjointness
      // invariant; it exists so [[serveNearDup]] can skip whole appends
      // whose bands share no key with an arriving batch)
      SketchPart("band", Seq(s"$base/bands").filter(hasParquet(spark, _)),
        bandSketchKey(col("band"), col("key")), Some(BandKeySchema)))
    val res = sketchJob(spark, parts,
      fams.map { case (f, (sk, _)) => f -> sk },
      buildSketch = true, capLog2(spark))
    // digest/fp delta: anti-join ONLY the bloom-hit (or sketch-less)
    // appends — a committed row equal to a staged row always hits its
    // append's sketch (no false negatives), so the pruned anti-join's
    // output is row-identical to the r20 full-store anti-join. The two
    // rewrites touch disjoint components — overlap them (guide §2.6)
    inParallel(Seq(
      () => rewriteDelta(spark, pinned, base, "digests",
        res("dig").hitIds ++ fams("dig")._2),
      () => rewriteDelta(spark, pinned, base, "fps",
        res("fp").hitIds ++ fams("fp")._2)))
    // audit-summary sidecar: the baseline (prunes the commit's
    // digest/fp audit to post-baseline racers), the did-audit hit list
    // (prunes the commit's scan-confirm to exactly these appends), and
    // the sketches future stagings and commits will test against
    writeBaseline(spark, base, pinned)
    writeDidHits(spark, base,
      (res("did").hitIds ++ fams("did")._2).toSeq.sorted)
    Seq("did", "dig", "fp", "band").foreach { f =>
      res(f).sketch.foreach(sk =>
        writeSketchFile(spark, s"$base/$SummaryDir/${FamFile(f)}", sk))
    }
    aid
  }

  /** Rewrite a staged digest/fp candidate component to its committed
    * delta, anti-joining ONLY `scanIds` (the sketch-hit and sketch-less
    * appends) — preserves the one-row-per-distinct-value invariant,
    * making append == rebuild, while the no-hit case keeps the direct
    * candidate write untouched. The rewrite lands in a dot-temp and
    * swaps in (staging is invisible until commit, so the swap races
    * nothing). The persisted sketch covers the PRE-rewrite candidate
    * superset — covering is all pruning soundness needs. */
  private def rewriteDelta(spark: SparkSession, pinned: Snapshot,
      base: String, comp: String, scanIds: Set[String]): Unit =
    if (scanIds.nonEmpty && hasParquet(spark, s"$base/$comp")) {
      val ordered = pinned.ids.filter(scanIds)
      val paths = componentPaths(spark, pinned.dir, ordered, comp)
      if (paths.nonEmpty) {
        val schema = if (comp == "digests") DigestSchema else FpSchema
        val cur = spark.read.schema(schema).parquet(s"$base/$comp")
        val delta = cur.join(spark.read.schema(schema).parquet(paths: _*),
          cur.columns.toSeq, "left_anti")
        val tmp = s"$base/.$comp.delta"
        delta.write.mode("overwrite").parquet(tmp)
        val fsx = hfs(spark, new HPath(base))
        fsx.delete(new HPath(s"$base/$comp"), true)
        FileContext.getFileContext(fsx.getUri,
            spark.sparkContext.hadoopConfiguration)
          .rename(new HPath(tmp), new HPath(s"$base/$comp"))
      }
    }

  /** Atomically publish `ids` (+ carried `tombstones`) as manifest
    * version `version` — CREATE-IF-ABSENT: the content is written to a
    * uuid'd dot-temp (invisible to [[currentManifest]]'s pattern) and
    * renamed WITHOUT overwrite, so exactly one writer can claim a
    * given version. Returns false when a racer already claimed it —
    * the caller re-reads the new state and retries. */
  private[graft] def publishOnce(spark: SparkSession, dir: String,
      ids: Seq[String], tombstones: Map[String, Long],
      version: Long): Boolean = {
    val mf = new HPath(s"$dir/MANIFEST.v$version")
    val fs = hfs(spark, mf)
    val tmp = new HPath(s"$dir/.MANIFEST.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    val lines = ids ++ tombstones.toSeq.sortBy(t => (t._2, t._1))
      .map { case (t, v) => s"#tombstone@$v $t" }
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    try {
      FileContext.getFileContext(fs.getUri,
          spark.sparkContext.hadoopConfiguration)
        .rename(tmp, mf) // no Rename.OVERWRITE: fails if the version exists
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        fs.delete(tmp, false); false
      case e: java.io.IOException if fs.exists(mf) =>
        // some FileContext implementations surface the existing
        // destination as a plain IOException — same lost race
        fs.delete(tmp, false); false
    }
  }

  /** AUDIT the staged append as it exists on disk, then atomically
    * publish it into the next manifest version. The audit re-reads the
    * staged deltas (the bytes a consumer would scan, not the producing
    * plan) and requires (a) the digest/fp deltas disjoint from the
    * committed store — the invariant every probe join relies on — and
    * (b) the staged sets/docs doc ids disjoint from the committed
    * sets/docs — the distinct-doc-ids caller contract, enforced as a
    * rejected conflict (VERDICT r18: two racing appends of overlapping
    * doc_ids must not both land their sets/bands rows; sets drops
    * sub-shingle-length docs, so the docs component participates in
    * the same did namespace to catch short-doc duplicates). The audit
    * build sides are PRUNED by the `.summary` sidecar — digest/fp
    * against post-baseline racers only, dids against Bloom-hit appends
    * only (see the body comment for the no-lost-detection argument) —
    * so a no-race commit touches O(delta) bytes, not the store. The audit+publish pair is
    * atomic with respect to the version chain: [[publishOnce]] claims
    * v+1 only if nothing committed since the state v the audit ran
    * against; a losing racer loops — re-reads, re-checks idempotence,
    * re-audits — so non-overlapping racers all land, and a staged
    * append whose delta overlaps a racer's committed rows is REJECTED
    * (staging deleted, manifest untouched) instead of duplicating an
    * index row. Re-committing an already-committed (or tombstoned) id
    * is a no-op (crash-after-publish recovery), and committing an id
    * that was never staged (or already GC'd) refuses rather than
    * publishing a dangling id. */
  private[graft] def commit(spark: SparkSession, dir: String,
      aid: String): Unit = {
    val base = s"$dir/appends/$aid"
    val fs = hfs(spark, new HPath(base))
    var published = false
    while (!published) {
      val m = currentManifest(spark, dir)
      if (m.ids.contains(aid) || m.tombstones.contains(aid)) {
        // idempotent: already published (possibly compacted since)
        fs.delete(new HPath(s"$base/$InflightMarker"), false)
        return
      }
      require(fs.exists(new HPath(base)),
        s"SnapshotStore commit of $aid at $dir: no staged directory " +
          "(never staged, or GC'd) — refusing to publish a dangling id")
      // a live commit keeps refreshing its staging dir's age, so
      // gcOrphans' grace rule protects a long audit/publish too (not
      // just the staging writes — the review's long-commit hazard)
      touchInflight(spark, base)
      // the conflict classes — digest rows, fp rows, and doc ids —
      // audit as ONE tagged-union left-semi: each side projects to a
      // namespace-tagged key, so one semi-join job replaces three
      // driver round-trips per commit (the commit is every append's —
      // and every s42 micro-batch's — hot path). doc ids share ONE
      // `did` namespace across sets AND docs: sets drops docs whose
      // shingle set is empty (< k tokens), so a short-doc did
      // duplicate is only visible through the docs component —
      // auditing both sides' dids against both committed components
      // closes that gap (digests/fps stay full-row: the
      // one-row-per-distinct-value invariant).
      //
      // PRUNING (VERDICT r19 #2 closed at r20; r21 moves the sketch
      // test to STAGE time): digest/fp build sides scan only appends
      // committed AFTER this staging's recorded baseline (the racers),
      // each first tested against its sidecar sketch — no detection
      // power lost: the staging anti-join already executed
      // probe-vs-baseline over the SAME immutable committed bytes, and
      // a racer row equal to a staged row always hits the racer's
      // sketch. The did contract has no staging anti-join, so it
      // audits against ALL committed appends — but the baseline half
      // of that test ran at STAGE time over the same staged bytes and
      // its verdict is the recorded `did.hits` list, so the commit
      // launches a sketch-test job ONLY for racers (none in the
      // no-race case: the common commit runs ZERO jobs). A legacy
      // staging without `did.hits` falls back to testing every
      // committed sketch; a sketch-less committed append falls back to
      // an unconditional scan. False positives cost a confirming scan,
      // never a verdict.
      val baseline = readBaseline(spark, base).map(_.toSet)
      val racerIds = baseline match {
        case Some(b) => m.ids.filterNot(b)
        case None => m.ids
      }
      val stagedDig = hasParquet(spark, s"$base/digests")
      val stagedFp = hasParquet(spark, s"$base/fps")
      val stagedDidComps = Seq("sets", "docs")
        .filter(c => hasParquet(spark, s"$base/$c"))
      val didRecorded = readDidHits(spark, base)
      val didTestIds =
        if (stagedDidComps.isEmpty) Seq.empty
        else if (didRecorded.isDefined) racerIds
        else m.ids
      val digFams = if (stagedDig) famSketches(spark, dir, racerIds, "dig")
        else (Nil, Nil)
      val fpFams = if (stagedFp) famSketches(spark, dir, racerIds, "fp")
        else (Nil, Nil)
      val didFams = famSketches(spark, dir, didTestIds, "did")
      val res = sketchJob(spark,
        Seq(
          SketchPart("dig", Seq(s"$base/digests").filter(_ => stagedDig),
            col("h"), Some(DigestSchema)),
          SketchPart("fp", Seq(s"$base/fps").filter(_ => stagedFp),
            col("fp"), Some(FpSchema))) ++
          stagedDidComps.map(c =>
            SketchPart("did", Seq(s"$base/$c"), col("did"), None)),
        Map("dig" -> digFams._1, "fp" -> fpFams._1, "did" -> didFams._1),
        buildSketch = false, capLog2(spark))
      val digScan = res("dig").hitIds ++ digFams._2
      val fpScan = res("fp").hitIds ++ fpFams._2
      val didScanSet = res("did").hitIds ++ didFams._2 ++
        didRecorded.getOrElse(Nil).filter(m.ids.contains)
      val didScanIds = m.ids.filter(didScanSet)
      // full-row components: key = component-tagged whole row,
      // committed side restricted to sketch-hit (or sketch-less) racers
      val rowParts = Seq(("digests", digScan), ("fps", fpScan))
        .flatMap { case (comp, scan) =>
          if (!hasParquet(spark, s"$base/$comp") || scan.isEmpty) None
          else {
            val committed =
              componentPaths(spark, dir, m.ids.filter(scan), comp)
            if (committed.isEmpty) None
            else {
              def key(df: DataFrame) = df.select(
                concat(lit(comp), lit(":"),
                  col(df.columns.head).cast("string")).as("k"))
              Some((key(spark.read.parquet(s"$base/$comp"))
                  .withColumn("comp", lit(comp)),
                key(spark.read.parquet(committed: _*))))
            }
          }
        }
      def dids(comp: String, paths: Seq[String]): Option[DataFrame] =
        if (paths.isEmpty) None
        else Some(spark.read.parquet(paths: _*).select(
          concat(lit("did:"), col("did").cast("string")).as("k"))
          .withColumn("comp", lit(comp)))
      // resolve the COMMITTED side's paths first: constructing a
      // parquet DataFrame launches its schema-inference job, so the
      // staged side must not be built when there is nothing to audit
      // against (the no-hit commit — the common case — stays jobless)
      val committedDidPaths = Seq("sets", "docs")
        .map(c => c -> componentPaths(spark, dir, didScanIds, c))
      val didPart =
        if (committedDidPaths.forall(_._2.isEmpty)) None
        else {
          val stagedDids = stagedDidComps
            .flatMap(c => dids(c, Seq(s"$base/$c")))
          val committedDids = committedDidPaths
            .flatMap { case (c, ps) => dids(c, ps) }
          if (stagedDids.isEmpty || committedDids.isEmpty) None
          else Some((stagedDids.reduce(_ unionByName _),
            committedDids.reduce(_ unionByName _).drop("comp")))
        }
      val parts = rowParts ++ didPart
      if (parts.nonEmpty) {
        val hit = parts.map(_._1).reduce(_ unionByName _)
          .join(parts.map(_._2).reduce(_ unionByName _),
            Seq("k"), "left_semi")
          .select(col("comp")).limit(1).collect()
        hit.headOption.foreach { row =>
          fs.delete(new HPath(base), true)
          throw new IllegalStateException(
            s"SnapshotStore commit rejected: staged append $aid overlaps " +
              s"the committed ${row.getString(0)} component of $dir " +
              "(concurrent append? duplicate doc ids?); staging deleted, " +
              "manifest untouched")
        }
      }
      published = publishOnce(spark, dir, m.ids :+ aid, m.tombstones,
        m.version + 1)
    }
    fs.delete(new HPath(s"$base/$InflightMarker"), false)
  }

  /** Append one snapshot's index rows to the store at `dir`:
    * [[stage]] → [[commit]] (audit + versioned publish). Returns the
    * committed append id. Concurrent appends are safe: each commit
    * retries through the optimistic-concurrency protocol.
    * `persistDocs` also stores the snapshot rows as the `docs`
    * component (the curated corpus itself). */
  def append(spark: SparkSession, dir: String, snapshot: DataFrame,
      id: String = "doc_id", text: String = "text",
      k: Int = 32, r: Int = 2, persistDocs: Boolean = false): String = {
    val aid = stage(spark, dir, snapshot, id, text, k, r, persistDocs)
    commit(spark, dir, aid)
    aid
  }

  /** [[append]] under a CALLER-SUPPLIED append id — the exactly-once
    * REPLAY KEY for streaming commits (s42's foreachBatch derives it
    * from (increment id, micro-batch id)): re-appending an id that is
    * already in the manifest — or TOMBSTONED there, because a
    * compaction superseded it after it committed — is a NO-OP (the
    * replayed batch already committed — its content must be the
    * committed content, which is the caller's uniqueness contract: one
    * id ⇔ one logical append, stable across restarts), and a leftover
    * staging directory under the same id is REPLACED before re-staging
    * (an uncommitted dir under a caller-keyed id can only be a torn
    * earlier attempt of this same logical append — the
    * crash-between-stage-and-commit recovery, per id instead of via
    * gcOrphans). Returns true iff this call committed the append
    * (false = replay no-op). */
  def appendAs(spark: SparkSession, dir: String, aid: String,
      snapshot: DataFrame, id: String = "doc_id", text: String = "text",
      k: Int = 32, r: Int = 2, persistDocs: Boolean = false): Boolean = {
    requireValidId(aid)
    val m = currentManifest(spark, dir)
    if (m.ids.contains(aid) || m.tombstones.contains(aid)) false
    else {
      val base = new HPath(s"$dir/appends/$aid")
      val fs = hfs(spark, base)
      if (fs.exists(base)) fs.delete(base, true)
      stageAs(spark, dir, aid, snapshot, id, text, k, r, persistDocs)
      commit(spark, dir, aid)
      true
    }
  }

  /** Rewrite committed appends into ONE compacted append, through the
    * same stage→audit→publish protocol — bounds the O(appends)
    * manifest + per-append listing cost every [[readComponent]] pays
    * (after thousands of crawl-cycle appends, each probe would walk
    * thousands of directories). `only` restricts the rewrite to a
    * subset of committed ids (e.g. the K oldest); default = all.
    *
    * AUDIT: the staged rewrite must be row-multiset-equal to its
    * source appends, per component (count equality + one-sided
    * EXCEPT ALL — together they imply multiset equality). The audit is
    * O(compacted bytes), the same order as the rewrite it guards.
    *
    * PUBLISH: the new manifest is the compacted id plus every
    * committed id NOT compacted — so appends that raced in after the
    * compactor captured its sources survive — plus a `#tombstone` line
    * per superseded id, so a replayed keyed append of a compacted id
    * still no-ops ([[appendAs]]). If a source id vanishes from the
    * manifest mid-compaction (a concurrent compactor), the publish
    * refuses rather than duplicate the rows it rewrote: appends may
    * race a compaction freely, compactions must not race each other.
    * Superseded append directories become unlisted; [[gcOrphans]]
    * reclaims them. Returns the compacted append id. */
  def compact(spark: SparkSession, dir: String,
      only: Option[Seq[String]] = None): String = {
    val idsNow = committedIds(spark, dir)
    val ids0 = only.getOrElse(idsNow)
    require(ids0.nonEmpty,
      s"SnapshotStore.compact at $dir: no committed appends")
    require(ids0.forall(idsNow.contains),
      s"SnapshotStore.compact at $dir: sources not committed: " +
        ids0.filterNot(idsNow.contains).mkString(","))
    val aid = s"compact-${java.util.UUID.randomUUID()}"
    val base = s"$dir/appends/$aid"
    val fs = hfs(spark, new HPath(base))
    touchInflight(spark, base)
    val srcPaths = Components.map { c =>
      c -> componentPaths(spark, dir, ids0, c)
    }.toMap
    // the component rewrites are independent jobs — overlap them
    // (guide §2.6), like the staging writes; each source schema is
    // captured once so the audit and sidecar reads below skip their
    // own inference jobs
    val srcSchemas = new java.util.concurrent.ConcurrentHashMap[
      String, org.apache.spark.sql.types.StructType]()
    inParallel(Components.flatMap { c =>
      val ps = srcPaths(c)
      if (ps.isEmpty) None
      else Some(() => {
        val df = spark.read.parquet(ps: _*)
        srcSchemas.put(c, df.schema)
        df.write.mode("error").parquet(s"$base/$c")
      })
    })
    def compSchema(c: String) = Option(srcSchemas.get(c))
    def didField(c: String) = compSchema(c).map(s =>
      org.apache.spark.sql.types.StructType(Seq(s("did"))))
    // the compacted append carries its own did/digest/fp sketches (one
    // aggregation pass over the rewritten bytes — same order as the
    // rewrite itself): without them, every future commit's did audit
    // and every future staging's anti-join would fall back to scanning
    // the corpus-sized compacted components
    val skRes = sketchJob(spark, Seq(
      SketchPart("did", Seq(s"$base/sets").filter(hasParquet(spark, _)),
        col("did"), didField("sets")),
      SketchPart("did", Seq(s"$base/docs").filter(hasParquet(spark, _)),
        col("did"), didField("docs")),
      SketchPart("dig", Seq(s"$base/digests").filter(hasParquet(spark, _)),
        col("h"), Some(DigestSchema)),
      SketchPart("fp", Seq(s"$base/fps").filter(hasParquet(spark, _)),
        col("fp"), Some(FpSchema)),
      SketchPart("band", Seq(s"$base/bands").filter(hasParquet(spark, _)),
        bandSketchKey(col("band"), col("key")), Some(BandKeySchema))),
      Map.empty, buildSketch = true, capLog2(spark))
    Seq("did", "dig", "fp", "band").foreach { f =>
      skRes(f).sketch.foreach(sk =>
        writeSketchFile(spark, s"$base/$SummaryDir/${FamFile(f)}", sk))
    }
    touchInflight(spark, base) // audit may outlast the staging writes
    auditCompactEquality(spark, base, srcPaths,
      c => compSchema(c)).foreach { comp =>
      fs.delete(new HPath(base), true)
      throw new IllegalStateException(
        s"SnapshotStore.compact audit failed on $comp at $dir: staged " +
          "rewrite is not row-equal to its sources; staging deleted, " +
          "manifest untouched")
    }
    var published = false
    while (!published) {
      touchInflight(spark, base)
      val m = currentManifest(spark, dir)
      if (!ids0.forall(m.ids.contains)) {
        fs.delete(new HPath(base), true)
        throw new IllegalStateException(
          s"SnapshotStore.compact at $dir: a source append left the " +
            "manifest mid-compaction (concurrent compact?); staging " +
            "deleted, manifest untouched")
      }
      val compacted = ids0.toSet
      published = publishOnce(spark, dir,
        aid +: m.ids.filterNot(compacted),
        m.tombstones ++ ids0.map(_ -> (m.version + 1)),
        m.version + 1)
    }
    fs.delete(new HPath(s"$base/$InflightMarker"), false)
    aid
  }

  /** The compact audit — staged rewrite row-multiset-equal to its
    * source appends, per component — as ONE Spark job instead of the
    * r20 form's 3 jobs PER component (count old + count new +
    * EXCEPT ALL): every side of every component projects to
    * (comp, md5(to_json(row))) and one grouped count compare proves
    * per-key multiset equality both ways, which implies the count +
    * one-sided-EXCEPT-ALL pair it replaces (md5 collisions are the
    * same impossibility the store's digest identity already rests on).
    * Returns the first mismatching component, None when equal. */
  private[graft] def auditCompactEquality(spark: SparkSession,
      base: String, srcPaths: Map[String, Seq[String]],
      schemaOf: String => Option[org.apache.spark.sql.types.StructType] =
        _ => None): Option[String] = {
    def readAll(c: String, ps: Seq[String]) = schemaOf(c) match {
      case Some(s) => spark.read.schema(s).parquet(ps: _*)
      case None => spark.read.parquet(ps: _*)
    }
    val sides = srcPaths.toSeq.sortBy(_._1).flatMap { case (c, ps) =>
      if (ps.isEmpty) None
      else {
        def keyed(df: DataFrame, side: String) = df.select(
          lit(c).as("comp"),
          md5(to_json(struct(df.columns.toIndexedSeq.map(col): _*))).as("k"),
          lit(side).as("side"))
        val neu =
          if (hasParquet(spark, s"$base/$c")) readAll(c, Seq(s"$base/$c"))
          else readAll(c, ps).limit(0)
        Some(keyed(readAll(c, ps), "src").unionByName(keyed(neu, "neu")))
      }
    }
    if (sides.isEmpty) None
    else sides.reduce(_ unionByName _)
      .groupBy(col("comp"), col("k"))
      .agg(
        sum(when(col("side") === "src", 1L).otherwise(0L)).as("n_src"),
        sum(when(col("side") === "neu", 1L).otherwise(0L)).as("n_new"))
      .where(col("n_src") =!= col("n_new"))
      .select(col("comp")).limit(1).collect()
      .headOption.map(_.getString(0))
  }

  /** Delete staging directories not listed in the manifest — the
    * recovery sweep for appends that crashed between stage and commit,
    * and the reclaimer for appends superseded by [[compact]] (CURRENT
    * readers never resolve either, so this is pure space reclamation).
    * The r18 operational contracts are now enforced mechanics:
    *  - an IN-FLIGHT append is protected by its `.INFLIGHT` marker —
    *    an unlisted dir whose marker is younger than `graceMs` is
    *    SKIPPED, and [[commit]]/[[compact]] RE-TOUCH the marker as
    *    they audit and publish, so even a stage+audit+commit that
    *    outlasts the grace age keeps its protection (a crashed
    *    attempt's marker stops being touched, ages out, and the dir
    *    is reclaimed); a marker that vanishes mid-probe (the owning
    *    commit just published) protects the dir for THIS sweep;
    *  - superseded compacted dirs carry no marker (commit/compact
    *    remove it at publish) and are reclaimed immediately; the
    *    manifest is RE-READ immediately before the deletes, so an
    *    append publishing while the sweep scanned cannot lose its
    *    dir (the residual publish→delete window is milliseconds and
    *    additionally covered by the marker rule above);
    *  - a pinned [[Snapshot]] that still references a swept dir fails
    *    LOUDLY on its next read (stale-snapshot error) instead of
    *    serving partial rows — run GC on the grace cadence, not under
    *    live pinned readers. RESIDUAL WINDOW: the loud guarantee holds
    *    at component-path RESOLUTION time; a pinned reader whose Spark
    *    job already planned over a superseded dir when the sweep
    *    reclaimed it can still die mid-scan with the filesystem's raw
    *    FileNotFoundException rather than the stale-snapshot error
    *    (superseded unmarked dirs are reclaimed without grace — the
    *    no-GC-under-live-pinned-readers cadence is what closes this).
    * Manifest HISTORY is trimmed too: versions below
    * current − `keepManifests` are deleted (the retention floor for
    * pinned readers), so the dir listing stays flat over thousands of
    * commits instead of accumulating one file per commit forever.
    * Torn publish temporaries are swept under the same grace rule —
    * a young `.MANIFEST.tmp-*` may belong to a publish between its
    * write and its rename. `tombstoneRetention = Some(k)` additionally
    * drops tombstones created more than k manifest versions ago
    * (publishing a trimmed manifest version) — the scaladoc'd
    * checkpoint-retention license, now a mechanism: size k so version
    * age covers the streaming-checkpoint retention of every keyed
    * writer, since a replayed keyed append older than its checkpoint
    * cannot occur, while a dropped tombstone inside a live replay
    * horizon would let [[appendAs]] re-append. Returns the deleted
    * append ids. */
  def gcOrphans(spark: SparkSession, dir: String,
      graceMs: Long = DefaultGcGraceMs,
      keepManifests: Int = DefaultKeepManifests,
      tombstoneRetention: Option[Long] = None): Seq[String] = {
    val root = new HPath(s"$dir/appends")
    val fs = hfs(spark, root)
    val now = System.currentTimeMillis()
    // tombstone retention (opt-in): drop tombstones created more than
    // `tombstoneRetention` manifest versions ago — the documented
    // checkpoint-retention license (a replay can only reach back as
    // far as a checkpoint exists; legacy unversioned tombstones parse
    // as version 0 and age out first). Published as a normal manifest
    // version through the optimistic loop, so it never races a commit.
    tombstoneRetention.foreach { keep =>
      require(keep > 0, "tombstoneRetention must be positive")
      var done = false
      while (!done) {
        val m = currentManifest(spark, dir)
        val kept = m.tombstones.filter { case (_, v) => v > m.version - keep }
        if (kept.size == m.tombstones.size) done = true
        else done = publishOnce(spark, dir, m.ids, kept, m.version + 1)
      }
    }
    if (fs.exists(new HPath(dir))) {
      fs.listStatus(new HPath(dir)).toSeq
        .filter(st => st.getPath.getName.startsWith(".MANIFEST.tmp-") &&
          now - st.getModificationTime >= graceMs)
        .foreach(st => fs.delete(st.getPath, false))
      val versions = fs.listStatus(new HPath(dir)).toSeq.map(_.getPath)
        .flatMap(p => p.getName match {
          case ManifestRe(n) => Some(n.toLong -> p); case _ => None
        })
      if (versions.nonEmpty) {
        val cur = versions.map(_._1).max
        versions.filter(_._1 <= cur - math.max(1, keepManifests))
          .foreach { case (_, p) => fs.delete(p, false) }
      }
    }
    // the dir's cached component schemas die on every sweep — cheap
    // (one re-inference later), and it covers the store-deleted-and-
    // recreated-at-the-same-path case even when `appends/` itself is
    // gone (ADVICE r21's stale-schema hazard)
    invalidateSchemas(dir)
    if (!fs.exists(root)) Seq.empty
    else {
      val live0 = committedIds(spark, dir).toSet
      val candidates = fs.listStatus(root).toSeq.map(_.getPath)
        .filter(p => !live0(p.getName))
        .filterNot { p =>
          // grace rule: a marked (in-flight) attempt whose marker is
          // young — or whose marker vanishes mid-probe (its commit is
          // publishing right now) — is not an orphan yet
          // protected while age < graceMs (strictly: age == grace is
          // EXPIRED, so graceMs = 0 deterministically sweeps a marker
          // stamped this very millisecond — ADVICE r19 flakiness)
          val marker = new HPath(p, InflightMarker)
          try fs.exists(marker) &&
            now - fs.getFileStatus(marker).getModificationTime < graceMs
          catch { case _: java.io.FileNotFoundException => true }
        }
      // final re-read: an append that published while we scanned must
      // keep its dir
      val live = committedIds(spark, dir).toSet
      val deleted = candidates.filter(p => !live(p.getName))
        .map { p => fs.delete(p, true); p.getName }
      // a reclaimed id may be recycled (tombstone-retention trim +
      // appendAs replay) — its cached sketches and byte totals must die
      // with its dir (schemas were invalidated above)
      invalidateSketches(dir, deleted)
      invalidateBytes(dir, deleted)
      deleted
    }
  }

  def sets(spark: SparkSession, dir: String): DataFrame =
    readComponent(spark, dir, "sets")
  def bands(spark: SparkSession, dir: String): DataFrame =
    readComponent(spark, dir, "bands")
  def digests(spark: SparkSession, dir: String): DataFrame =
    readComponent(spark, dir, "digests")
  def fps(spark: SparkSession, dir: String): DataFrame =
    readComponent(spark, dir, "fps")

  /** The accumulated CURATED CORPUS itself — the union of every
    * committed append's `docs` component (present when appends were
    * written with `persistDocs`, as [[Curation.cycleAppend]] and the
    * s42 streaming increment do): (did, lang, text), the training-data
    * increments a production run ships, served from the same
    * manifest-resolved file scans as the indexes. */
  def docs(spark: SparkSession, dir: String): DataFrame =
    readComponent(spark, dir, "docs")

  // ------------------------------------------------------------------
  // SERVE-PROBE SKETCH PRUNING (guide §3.2; VERDICT r21 top ask) — the
  // last O(store)-per-batch scan: both serve joins are equi-joins of a
  // (usually small) arriving batch against the full committed
  // components. When the committed bytes pass the conf gate, ONE
  // aggregation pass over the ARRIVING side tests its join keys
  // against every append's sidecar sketch and the component scans are
  // pruned to the HIT appends (plus sketch-less legacy appends — the
  // conservative must-scan fallback). Soundness is the sketches'
  // no-false-negative guarantee: a committed row whose key equals an
  // arriving key always hits its own append's sketch, so every
  // join-participating row survives the pruning and the join output is
  // row-identical; a false positive only adds a scanned append.
  // Disjoint probe batches — the common crawl case — scan NOTHING of
  // the store. At fixture scale the gate never fires and the serve
  // plans are byte-identical to r21's.
  // ------------------------------------------------------------------

  /** The serve-pruned component scan: `comp` restricted to `ids`; an
    * empty id set yields the EMPTY frame under the component's schema
    * (static for digests/fps; the cached inferred schema otherwise,
    * resolved over the FULL snapshot's paths). */
  private def componentOf(spark: SparkSession, s: Snapshot, comp: String,
      ids: Seq[String]): DataFrame = {
    val paths = componentPaths(spark, s.dir, ids, comp)
    val schema =
      if (comp == "digests") DigestSchema
      else if (comp == "fps") FpSchema
      else cachedComponentSchema(spark, s.dir, comp,
        componentPaths(spark, s.dir, s.ids, comp))
    if (paths.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(paths: _*)
  }

  /** Near-dup delta of `arriving` docs against the STORED snapshot
    * index — [[MinHashLsh.probeIndex]] over the store's file scans;
    * row-equal to the inline [[MinHashLsh.snapshotNearDupPairs]] on
    * the same corpora (SnapshotStoreSpec). bands+sets come from ONE
    * pinned [[Snapshot]], never two manifest resolutions.
    *
    * Above the [[ServePruneConfKey]] byte gate (batch probes only —
    * a stream-static arriving frame cannot host the probe pass), the
    * arriving batch BANDS ONCE (localCheckpoint — bounded by the batch,
    * reused by the probe pass and the join), its band keys sketch-test
    * every append's `band.bloom`, and bands+sets scan ONLY hit appends:
    * a candidate pair needs an equal (band, key), which always hits its
    * append's sketch, and the candidate's sets row lives in the SAME
    * append as its bands row (both derive from the one staged snapshot;
    * compaction rewrites components together), so pruning both
    * components to the hit set loses no pair. */
  def serveNearDup(spark: SparkSession, dir: String, arriving: DataFrame,
      id: String = "doc_id", text: String = "text",
      k: Int = 32, r: Int = 2, threshold: Double = 0.8): DataFrame = {
    val s = snapshot(spark, dir)
    val minBytes = servePruneMinBytes(spark)
    def full() = MinHashLsh.probeIndex(s.bands(spark), s.sets(spark),
      arriving, id, text, k, r, threshold)
    if (arriving.isStreaming || minBytes < 0) return full()
    if (componentBytes(spark, s.dir, s.ids, "bands") +
        componentBytes(spark, s.dir, s.ids, "sets") < minBytes)
      return full()
    val (bandSk, bandScanless) = famSketches(spark, s.dir, s.ids, "band")
    if (bandSk.isEmpty) return full() // pre-band-sidecar store: nothing prunable
    // split materialization (guide §2.3 — keys, not payloads): the
    // shingle arrays checkpoint ONCE (never through the 16-way band
    // explode, which would replicate every array per band row), the
    // lean (b_id, band, key) frame checkpoints separately and feeds
    // both the sketch probe and the band join
    val setsB = MinHashLsh.arrivingSets(arriving, id, text).localCheckpoint()
    val bandKeys = MinHashLsh.bandKeysOf(setsB, k, r).localCheckpoint()
    import spark.implicits._
    val keys = bandKeys.select(lit("band").as("fam"),
      bandSketchKey(col("band"), col("key")).as("k")).as[(String, String)]
    val res = sketchAgg(spark, keys, Map("band" -> bandSk),
      buildSketch = false, capLog2(spark))
    val hit = res.get("band").map(_.hitIds).getOrElse(Set.empty) ++
      bandScanless
    val ids = s.ids.filter(hit)
    MinHashLsh.probeSplit(componentOf(spark, s, "bands", ids),
      componentOf(spark, s, "sets", ids), bandKeys, setsB, threshold)
  }

  /** Snapshot-delta classification of `b` against the STORED digest
    * indexes — [[Dedup.applySnapshotDelta]] over the store's file
    * scans; row-equal to the inline [[Dedup.snapshotDelta]].
    * digests+fps come from ONE pinned [[Snapshot]].
    *
    * Above the [[ServePruneConfKey]] byte gate (batch probes only),
    * one pass over `b` computes its md5/fingerprint join keys and
    * sketch-tests them against every append's digest/fp sidecars;
    * the digests/fps scans are pruned to hit appends — a committed
    * digest equal to an arriving one always hits its append's sketch,
    * so the LEFT joins see every matching row and the classification
    * is row-identical. */
  def serveDelta(spark: SparkSession, dir: String, b: DataFrame,
      text: Column, src: Column): DataFrame = {
    val s = snapshot(spark, dir)
    val (dig, fp) = serveDigestIndexes(spark, s, b, text)
    Dedup.applySnapshotDelta(b,
      dig.withColumn("in_a", lit(1L)),
      fp.withColumn("fp_in_a", lit(1L)),
      text, src)
  }

  private def serveDigestIndexes(spark: SparkSession, s: Snapshot,
      b: DataFrame, text: Column): (DataFrame, DataFrame) = {
    val minBytes = servePruneMinBytes(spark)
    def full() = (s.digests(spark), s.fps(spark))
    if (b.isStreaming || minBytes < 0) return full()
    if (componentBytes(spark, s.dir, s.ids, "digests") +
        componentBytes(spark, s.dir, s.ids, "fps") < minBytes)
      return full()
    val (digSk, digScanless) = famSketches(spark, s.dir, s.ids, "dig")
    val (fpSk, fpScanless) = famSketches(spark, s.dir, s.ids, "fp")
    if (digSk.isEmpty && fpSk.isEmpty) return full()
    import spark.implicits._
    val keys = b.select(lit("dig").as("fam"), md5(text).as("k"))
      .union(b.select(lit("fp").as("fam"),
        Text.fingerprint(text).as("k")))
      .as[(String, String)]
    val res = sketchAgg(spark, keys, Map("dig" -> digSk, "fp" -> fpSk),
      buildSketch = false, capLog2(spark))
    val digHit = res.get("dig").map(_.hitIds).getOrElse(Set.empty) ++
      digScanless
    val fpHit = res.get("fp").map(_.hitIds).getOrElse(Set.empty) ++
      fpScanless
    (componentOf(spark, s, "digests", s.ids.filter(digHit)),
      componentOf(spark, s, "fps", s.ids.filter(fpHit)))
  }
}
