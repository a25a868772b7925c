package graft.enrich

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.AiConfig

/** Durable pause→resume for GROUPED conversation enrichment — the
  * reference's pause also fires mid-group inside
  * `process_single_item` (`/root/reference/main.py:388-392`, reached
  * from the sequential grouped branch at `main.py:508-512`), where a
  * resume must restore the per-group message history before the next
  * turn. [[EnrichCheckpoint]] covers the row-wise path (keyed by
  * `row_index`); this object is its grouped twin, keyed by
  * (group, turn).
  *
  * The checkpoint stores NO serialized history: a conversation's
  * history is exactly (input prompts at positions 1..k, checkpointed
  * responses at turns 1..k), so persisting the completed turns is
  * sufficient — [[EnrichRunner.resumeConversations]] re-folds it.
  * What the certificate must therefore guarantee is that the stored
  * turns are (a) untampered, (b) a complete 1..k prefix per group
  * (a hole would silently shift history), and (c) still aligned with
  * TODAY's input — same group, same position, same prompt (the
  * history is rebuilt from today's prompts, so a drifted input makes
  * yesterday's responses unusable for replay).
  *
  * Certificate (the q198/q195 discipline, grouped): total rows,
  * group count, per-group gap count (n = max ∧ 2·Σturn = max·(max+1)
  * — the arithmetic complete-prefix test), and the XOR of per-row
  * `xxhash64(group, turn, prompt, response)` — the four-way pair
  * binding: a response swapped between two turns OR two groups flips
  * the hash even though every response-only stat survives. Input
  * alignment is verified at resume by positioning today's input
  * (row_number per group — a partitioned window, scalable) and
  * counting exact (group, orderCols, turn, prompt) matches against
  * the loaded results: the count must equal the certified row count.
  * Any mismatch → empty verdict → the resume emits ZERO rows before
  * any enrichment plan executes; refuse, never fabricate.
  */
object ConversationCheckpoint {

  /** Hive-partition column of a delta/compaction generation's
    * `results` part: `hash(group) % NumBuckets`. All rows of a group
    * land in ONE bucket subdirectory, so a per-batch fold that knows
    * its touched groups reads only the touched buckets' files
    * (partition pruning at the parquet listing) — O(touched) IO per
    * micro-batch instead of scanning every chain generation's full
    * results part. The column is DERIVED (recomputable from the group
    * value), so readers drop it after pruning and nothing downstream
    * changes. */
  val BucketCol = "__bucket"

  /** Bucket count is a FIXED constant, deliberately not a knob: the
    * pruned chain read filters every chain link with bucket ids
    * computed once from the batch's groups, which is only sound if
    * every bucketed generation in a chain used the same modulus. (A
    * deployment that must re-bucket can do so at a compaction
    * boundary — the compaction rewrites the full history — but then
    * the OLD chain must be fully collected first.) 64 buckets bound
    * read amplification at 1/64th of history per touched group while
    * keeping small deltas from scattering into thousands of
    * directories. */
  val NumBuckets = 64

  /** The bucket expression over a group column — pinned to
    * xxhash64 % NumBuckets; shared by the writer ([[publishDelta]])
    * and every pruned reader so the two can never disagree. */
  def bucketExpr(groupCol: String): org.apache.spark.sql.Column =
    pmod(xxhash64(col(groupCol)), lit(NumBuckets.toLong)).cast("int")

  /** The bucket ids a batch's groups hash to — ≤ [[NumBuckets]] values
    * (a KB-sized driver collect), the partition-pruning key a serve
    * passes to [[chainResults]] each micro-batch. */
  def touchedBuckets(batch: DataFrame, groupCol: String): Seq[Int] =
    batch.select(bucketExpr(groupCol).as("b")).distinct()
      .collect().map(_.getInt(0)).toSeq

  /** Per-GROUP certificate stats — the mergeable decomposition of
    * [[certificate]]: one row per group, (groupCol, g_n, g_max, g_sum,
    * g_xor). This is also the `gcert` PART a delta generation persists
    * for its touched groups (see [[publishDelta]]): every global stat
    * is a fold of these rows, so a publisher can re-certify a
    * 100-batch chain by recomputing ONLY the touched groups' rows and
    * folding — O(touched history + groups) per publish instead of a
    * full-history scan. */
  def groupCertificate(results: DataFrame, groupCol: String,
      promptCol: String): DataFrame =
    results.groupBy(col(groupCol)).agg(
      count(lit(1)).as("g_n"),
      max(col("turn_number")).as("g_max"),
      sum(col("turn_number")).as("g_sum"),
      expr(s"bit_xor(xxhash64($groupCol, turn_number, $promptCol, response))")
        .as("g_xor"))

  /** Fold per-group stats ([[groupCertificate]] shape) to the global
    * certificate row — bit-identical to [[certificate]] over the same
    * data (sums, counts, the arithmetic gap test, and XOR are all
    * order-insensitive merges of the per-group rows). */
  def foldGroupCertificate(perGroup: DataFrame): DataFrame =
    perGroup.agg(
      coalesce(sum(col("g_n")), lit(0L)).as("ck_n"),
      count(lit(1)).as("ck_groups"),
      coalesce(sum(when(col("g_n") === col("g_max") &&
          col("g_sum") * 2 === col("g_max") * (col("g_max") + 1), 0L)
        .otherwise(1L)), lit(0L)).as("ck_gaps"),
      coalesce(expr("bit_xor(g_xor)"), lit(0L)).as("ck_xor_pair"))

  /** The grouped certificate fold over a results frame carrying the
    * group/prompt columns plus (`turn_number`, `response`): ONE row —
    * (ck_n, ck_groups, ck_gaps, ck_xor_pair). Two partial-aggregate
    * passes (per-group, then global), KB-sized output at any scale.
    * Empty results fold to (0, 0, 0, 0). */
  def certificate(results: DataFrame, groupCol: String,
      promptCol: String): DataFrame =
    foldGroupCertificate(groupCertificate(results, groupCol, promptCol))

  /** Persist the mid-group pause: the completed turns plus their
    * certificate (with the cutoff turn) as one write-once registry
    * generation. The certificate folds the LANDED results part (a
    * staged publish — see [[EnrichCheckpoint.publish]] for why a plan
    * recomputation is wrong with a nondeterministic enricher). */
  def publish(s: SparkSession, root: String, kind: String,
      results: DataFrame, groupCol: String, promptCol: String,
      cursorTurn: Long): Long =
    graft.ext.ArtifactRegistry.publishStaged(s, root, kind, cursorTurn,
      Seq("results" -> results),
      landed => Seq("cursor" ->
        certificate(landed("results"), groupCol, promptCol)
          .withColumn("cursor_turn", lit(cursorTurn))))

  /** Publish a DELTA generation: the `results` part carries ONLY this
    * batch's fresh turns, and the cursor records `base_version` — the
    * generation whose full history this one extends (0 = none: the
    * generation is self-contained, the [[publish]] shape). The cursor's
    * certificate covers the FULL chain history, so verification of a
    * pinned delta generation still guarantees the complete 1..k prefix
    * per group over everything the chain holds — a tampered or
    * half-collected ancestor fails the same gate a tampered monolithic
    * checkpoint does. This is what bounds a long-lived publishing
    * serve's storage: per batch it writes O(batch) rows, not O(history)
    * ([[graft.streaming.Streaming.conversationServeStreamPublishing]]
    * owns the compaction policy that keeps the chain short).
    *
    * Each generation also lands a `gcert` part: per-group certificate
    * rows ([[groupCertificate]]) for the groups THIS delta touches
    * (full history stats for those groups — prior chain rows of the
    * touched groups plus the landed delta; for a self-contained
    * generation, all its groups). Newest-wins along the chain
    * ([[effectiveGroupCerts]]), which makes the publish itself
    * incremental: when the base chain is fully gcert-covered, the
    * cursor folds (untouched groups' standing rows ∪ the recomputed
    * touched rows) — O(touched history + groups) per publish, never a
    * full-history scan; bit-identical to the data-derived certificate
    * because every global stat is an order-insensitive merge of the
    * per-group rows. A chain containing pre-gcert generations (a plain
    * [[publish]] seed) falls back to the data-derived cursor until the
    * first compaction roots a fully-covered chain. */
  def publishDelta(s: SparkSession, root: String, kind: String,
      delta: DataFrame, groupCol: String, promptCol: String,
      cursorTurn: Long, baseVersion: Long): Long =
    graft.ext.ArtifactRegistry.publishStaged(s, root, kind, cursorTurn,
      // the results part lands GROUP-BUCKETED (hash(group) % NumBuckets
      // partition directories): a group's full history lives in one
      // bucket per generation, so the serve's per-batch fold
      // partition-prunes every chain link to its touched buckets —
      // O(touched) IO, completing the O(touched)-compute story
      Seq("results" -> delta.withColumn(BucketCol, bucketExpr(groupCol))),
      landed => {
        // the landed read re-discovers BucketCol as a partition column
        // (unless the delta was EMPTY — a zero-row partitioned write
        // lands as an unpartitioned schema file); certificates are
        // over the logical rows, so drop it. Touched-bucket ids come
        // from bucketExpr over the landed groups — the same pinned
        // expression the writer used, present in every layout
        val landedResults = landed("results").drop(BucketCol)
        lazy val landedBuckets = touchedBuckets(landedResults, groupCol)
        val gNew =
          if (baseVersion == 0L)
            groupCertificate(landedResults, groupCol, promptCol)
          else {
            val touchedGroups = landedResults.select(col(groupCol)).distinct()
            val priorTouched =
              chainResults(s, root, kind, baseVersion, Some(landedBuckets))
                .join(touchedGroups, Seq(groupCol), "left_semi")
            groupCertificate(
              priorTouched.unionByName(
                landedResults.select(priorTouched.columns.map(col): _*)),
              groupCol, promptCol)
          }
        val curStats =
          if (baseVersion == 0L) foldGroupCertificate(gNew)
          else effectiveGroupCerts(s, root, kind, baseVersion) match {
            case Some(standing) =>
              val touchedGroups = landedResults.select(col(groupCol)).distinct()
              foldGroupCertificate(
                standing.join(touchedGroups, Seq(groupCol), "left_anti")
                  .unionByName(gNew))
            case None =>
              certificate(
                chainResults(s, root, kind, baseVersion).unionByName(
                  landedResults),
                groupCol, promptCol)
          }
        Seq("gcert" -> gNew,
          "cursor" -> curStats
            .withColumn("cursor_turn", lit(cursorTurn))
            .withColumn("base_version", lit(baseVersion))
            // the results row schema rides the KB-sized cursor so a
            // pruned chain read whose every touched bucket is empty
            // can build its empty frame WITHOUT opening any foreign
            // bucket's data file for schema inference (the open-audit
            // O(touched) contract covers that batch shape too)
            .withColumn("results_schema", lit(landedResults.schema.json)))
      },
      partitionCols = Map("results" -> Seq(BucketCol)))

  /** The chain's EFFECTIVE per-group certificates: for every group,
    * the newest chain generation's `gcert` row (a delta re-states its
    * touched groups' full-history stats, so newest wins). None if any
    * chain generation lacks a gcert part (published before the
    * incremental certificate existed) — callers fall back to the
    * data-derived certificate. One manifest read decides coverage;
    * the merge shuffles O(chain gcert rows), never history. */
  def effectiveGroupCerts(s: SparkSession, root: String, kind: String,
      version: Long): Option[DataFrame] = {
    val reg = graft.ext.ArtifactRegistry
    val vs = chain(s, root, kind, version)
    // retryFnf: a rotating serve resolves this per micro-batch and can
    // race a concurrent publisher's manifest compaction (append-then-
    // delete) — same one-shot posture as currentPin
    val covered = reg.retryFnf(reg.manifest(s, root, kind)
        .filter(col("part") === "gcert" && col("version").isin(vs: _*))
        .select(col("version")).collect()).map(_.getLong(0)).toSet
    if (!vs.forall(covered)) None
    else {
      val ranked = vs.zipWithIndex.map { case (v, i) =>
        reg.read(s, root, kind, v, "gcert").withColumn("__rank", lit(i))
      }.reduce(_ unionByName _)
      // the gcert schema is (group column, 4 stat columns); the group
      // column is whatever the publisher grouped by
      val gc = ranked.columns
        .filterNot(Set("g_n", "g_max", "g_sum", "g_xor", "__rank")).head
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(gc)).orderBy(col("__rank"))
      Some(ranked
        .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("__rn") === 1).drop("__rank", "__rn"))
    }
  }

  /** `base_version` pointers, memoized: a generation's cursor is
    * write-once (errorIfExists parts + manifest-last visibility) and
    * version numbers are never reused (the publisher numbers past gc'd
    * directories via the retained manifest rows), so a pointer read
    * once is valid for the process lifetime — a serve that walks its
    * chain every micro-batch pays ONE cursor collect per NEW
    * generation instead of O(depth) per batch. Entries are a few
    * dozen bytes; the size bound only guards a pathological
    * million-generation process. */
  private val baseVersionMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Long), Long]()

  private def baseVersionOf(s: SparkSession, root: String, kind: String,
      v: Long): Long = {
    if (baseVersionMemo.size > 65536) baseVersionMemo.clear()
    baseVersionMemo.computeIfAbsent((root, kind, v), { _ =>
      val cur = graft.ext.ArtifactRegistry.read(s, root, kind, v, "cursor")
      if (!cur.columns.contains("base_version")) 0L
      else cur.select(col("base_version")).collect()(0) match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    })
  }

  /** The generation chain of `version`, newest first, ending at its
    * self-contained root — one KB-sized cursor collect per link not
    * yet memoized (a generation published by [[publish]] has no
    * `base_version` column and roots the chain). Depth is bounded by
    * the publisher's compaction policy; the 64-link guard turns a
    * corrupted/looping pointer chain into an error instead of an
    * unbounded walk. */
  def chain(s: SparkSession, root: String, kind: String,
      version: Long): Seq[Long] = {
    val acc = scala.collection.mutable.ArrayBuffer.empty[Long]
    var v = version
    while (v != 0L) {
      require(acc.length < 64,
        s"conv checkpoint chain of $kind v$version exceeds 64 links under " +
          s"$root — a corrupted base_version pointer or a publisher that " +
          "never compacts; refusing the unbounded walk")
      require(!acc.contains(v),
        s"conv checkpoint chain of $kind v$version revisits v$v under $root")
      acc += v
      v = baseVersionOf(s, root, kind, v)
    }
    acc.toSeq
  }

  /** The FULL conversation history generation `version` represents:
    * its own `results` part unioned with its base chain's — the frame
    * a serve folds from and a compaction rewrites. Lazy scans over
    * immutable landed parts only.
    *
    * `buckets` (from [[touchedBuckets]]) prunes every bucketed chain
    * link to those [[BucketCol]] subdirectories — sound because a
    * group's rows always land in its own bucket, so the pruned union
    * still holds the COMPLETE history of every group that hashes into
    * `buckets`; a per-batch fold passes its batch's buckets and pays
    * O(touched) IO instead of O(history). The prune reads the touched
    * subdirectory PATHS directly (existence-checked, no partition
    * filter over the whole part), so an untouched bucket's files are
    * never opened — not even for schema inference — which is what the
    * open-audit spec pins. Only sound for group-scoped consumers:
    * certificate-against-cursor checks of the WHOLE chain need the
    * unpruned frame. Links published before bucketing (a plain
    * [[publish]] seed) carry no bucket layout and are read whole —
    * correct, just unpruned. */
  def chainResults(s: SparkSession, root: String, kind: String,
      version: Long, buckets: Option[Seq[Int]] = None): DataFrame = {
    require(version != 0L,
      s"no published generation of $kind under $root (version 0 is the " +
        "never-published sentinel, not a readable chain)")
    val reg = graft.ext.ArtifactRegistry
    val vs = chain(s, root, kind, version)
    def whole(v: Long): DataFrame =
      reg.read(s, root, kind, v, "results").drop(BucketCol)
    val frames = buckets match {
      case None => vs.map(whole)
      case Some(bs) => vs.flatMap { v =>
        if (!isBucketed(s, root, kind, v)) Some(whole(v))
        else {
          // read only the touched buckets' EXISTING subdirectories — a
          // generation holding none of the touched groups' rows
          // contributes nothing and is skipped without a single open
          val base = reg.partPath(root, kind, v, "results")
          val (f, _) = fsPath(s, base)
          val dirs = bs.map(b => s"$base/$BucketCol=$b")
            .filter(d => f.exists(new org.apache.hadoop.fs.Path(d)))
          if (dirs.isEmpty) None
          // leaf-dir reads see no partition column — already the
          // logical row schema the unioned fold wants
          else Some(s.read.parquet(dirs: _*))
        }
      }
    }
    if (frames.nonEmpty) frames.reduce(_ unionByName _)
    else {
      // every touched bucket empty across the whole chain (an
      // all-new-groups batch): an empty frame in the chain's row
      // schema. Reaching this branch means every link is bucketed,
      // i.e. published by [[publishDelta]], whose cursor records the
      // results schema — so the empty frame builds from that KB-sized
      // part with ZERO data-file opens (a whole-part schema inference
      // would open a foreign bucket's footer and break the open-audit
      // O(touched) contract). A pre-schema-cursor generation falls
      // back to the one-footer inference, documented and honest.
      val cur = reg.read(s, root, kind, vs.head, "cursor")
      val schema =
        if (cur.columns.contains("results_schema"))
          org.apache.spark.sql.types.DataType.fromJson(
              cur.select(col("results_schema")).collect()(0).getString(0))
            .asInstanceOf[org.apache.spark.sql.types.StructType]
        else whole(vs.head).schema
      s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
  }

  private def fsPath(s: SparkSession, p: String) = {
    val hp = new org.apache.hadoop.fs.Path(p)
    (hp.getFileSystem(s.sparkContext.hadoopConfiguration), hp)
  }

  /** Whether generation `v`'s results part landed group-bucketed —
    * one directory listing per call, deliberately NOT memoized:
    * generations are write-once by contract, but the pruned read must
    * stay honest about what storage HOLDS (the verify-what-you-serve
    * posture) — after an out-of-contract rewrite, a stale "bucketed"
    * answer would silently prune against directories that no longer
    * exist and truncate a healthy group's history; the per-group
    * certificate check would then refuse a batch the data still
    * supports. A listing is one metadata op per chain link per batch,
    * noise next to the parquet reads it guards. */
  private def isBucketed(s: SparkSession, root: String, kind: String,
      v: Long): Boolean = {
    val (f, p) = fsPath(s, graft.ext.ArtifactRegistry.partPath(root, kind, v, "results"))
    f.exists(p) && f.listStatus(p).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith(s"$BucketCol="))
  }

  /** Resume grouped conversations from loaded artifacts with
    * verification: re-fold the loaded results, join the fold against
    * the loaded cursor on every certificate stat, require zero
    * per-group gaps AND exact (group, orderCols, turn, prompt)
    * alignment with today's input. The alignment join carries the
    * ORDER columns as well as the turn/prompt — the replay join in
    * [[EnrichRunner.resumeConversations]] keys on (group, orderCols),
    * so a checkpoint whose order-column values were corrupted would
    * pass a turn/prompt-only gate and then silently re-enrich turns
    * that should replay verbatim; binding the order values here makes
    * that tamper class refuse like every other.
    *
    * Verification is EAGER (the ≤1-row verdict is collected before
    * any replay plan is built — the
    * [[graft.streaming.Streaming.conversationStreamResumed]]
    * posture): a refused checkpoint returns an EMPTY frame whose plan
    * contains no enrichment at all, so no fresh-turn API call and no
    * replay-fold tripwire can execute against a corrupted checkpoint.
    * A valid one yields the full conversation output (completed turns
    * replayed verbatim, fresh turns enriched against the restored
    * history) with `cursor_turn` and `n_prior` riding every row. */
  def resumeVerified(
      df: DataFrame,
      groupCol: String,
      orderCols: Seq[String],
      promptCol: String,
      loadedResults: DataFrame,
      loadedCursor: DataFrame,
      enricher: Enricher,
      config: AiConfig,
      systemPrompt: Option[String] = None,
      metrics: Option[EnrichMetrics] = None): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(orderCols.map(col): _*)
    val alignKeys =
      ((groupCol +: orderCols) ++ Seq("turn_number", promptCol)).distinct
    val positioned = df.select(
      ((groupCol +: orderCols) :+ promptCol).distinct.map(col) :+
        row_number().over(w).cast("long").as("turn_number"): _*)
    val matched = positioned
      .join(loadedResults.select(alignKeys.map(col): _*), alignKeys)
      .agg(count(lit(1)).as("ck_match"))
    val verdictRows = loadedCursor
      .join(certificate(loadedResults, groupCol, promptCol),
        Seq("ck_n", "ck_groups", "ck_gaps", "ck_xor_pair"))
      .filter(col("ck_gaps") === 0L)
      .crossJoin(matched)
      .filter(col("ck_match") === col("ck_n"))
      .select(col("cursor_turn"), col("ck_n").as("n_prior"))
      .collect()
    val resumedPlan = EnrichRunner.resumeConversations(df, groupCol, orderCols,
      promptCol, loadedResults, enricher, config, systemPrompt,
      metrics = metrics)
    if (verdictRows.isEmpty)
      // refuse: zero rows, and the limit(0) collapses to an empty
      // local relation — no replay join, no enricher call can run
      resumedPlan.limit(0)
        .withColumn("cursor_turn", lit(null).cast("long"))
        .withColumn("n_prior", lit(null).cast("long"))
    else {
      // cache: callers restore order with a sort, whose range-sampling
      // pass would otherwise run the fresh turns' enrichment twice
      val resumed = resumedPlan.cache()
      EnrichCheckpoint.trackResumedCache(df.sparkSession, resumed)
      resumed.withColumn("cursor_turn", lit(verdictRows(0).getLong(0)))
        .withColumn("n_prior", lit(verdictRows(0).getLong(1)))
    }
  }
}
