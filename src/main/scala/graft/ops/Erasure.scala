package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef

/** q338: the composed ERASURE AUDIT CERTIFICATE — the missing closure
  * of the erasure family (r17 verdict item 2): each erase verb
  * (q326/q329/q331/q336/q337) proves ITS OWN store clean, but nothing
  * swept ALL persisted stores for erased references, so adding store
  * N+1 would silently reopen the right-to-be-forgotten obligation.
  * The audit enumerates a REGISTRY of every eraseRewrite-maintained
  * store, runs the whole erase cascade, and counts — from the PARQUET
  * FILES under each erased root, never from the verbs' return frames —
  * (a) rows still referencing an erased id, (b) superseded BASE
  * payload dirs still resident beside the erased store, and (c) stale
  * freshness-tagged SIBLING roots under the store's base prefix (a
  * stale sibling is a retained PRE-ERASE copy — the per-store sweeps
  * must have removed it). The auditor's certificate is the all-zero
  * per-store ledger (the q142 declarative-contract discipline applied
  * to erasure).
  *
  * Two locks keep the certificate honest: Round18Spec runs the SAME
  * audit runner over a fixture with one store deliberately un-erased
  * and asserts the ledger goes nonzero (an audit that cannot fail
  * certifies nothing — q142's lesson), and a completeness check
  * re-greps src/main for `StoreGuard.eraseRewrite` call sites and
  * fails when the registry's distinct `site` count drifts from the
  * source — registering the erase verb without registering its store
  * here breaks the build. The oracle is the constant all-zero ledger:
  * DuckDB cannot see target/ disk state, so the SQL side pins schema
  * and the zero contract while the Spark side carries the physical
  * evidence (the per-store CONTENT equivalences are each erase verb's
  * own oracle — q326/q329/q331/q336 replay erase ≡ rebuild-without in
  * SQL; this query is the cross-store zero-residue certificate).
  *
  * q330's streaming state is deliberately absent: its RocksDB state
  * lives inside a per-run checkpoint that is deleted with the harness
  * (and the tombstone path physically clears the keyed aggregate);
  * there is no persisted root to audit once the run ends.
  *
  * Scale: each count is a column-pruned scan of one store (the stores
  * are delta/evidence-sized, never the corpus), and the cascade's
  * builders are all build-if-absent — steady-state cost is one
  * metadata listing plus one pruned count per registered store.
  */
object Erasure {

  /** One audited store: `site` names the eraseRewrite call site (the
    * completeness lock's join key — several payload rows may share
    * one site), `erasedRoot` ensures the erase transaction ran and
    * returns the predicate-tagged root, `payload` the parquet dir
    * under it, `refPred` the "references an erased id" predicate over
    * that payload's schema, `subjectCols` the erasure-subject columns
    * that must be part of the store's ROW GRAIN (see below),
    * `basePayloads` the superseded dirs that must be GONE from the
    * base root, (`siblingBase`, `siblingPrefix`) the store-root key
    * prefix whose non-live freshness-tagged siblings must have been
    * swept, and `grainCheck` an optional store-specific physical proof
    * that no row AGGREGATES ACROSS subjects.
    *
    * The grain rule (r18 verdict item 4): a row-drop erase is sound
    * only if every persisted cell derives from the row's OWN erasure
    * subject — a cross-subject rollup (e.g. an hourly blob over ALL
    * users) would retain erased users' contributions after the rows
    * referencing them are gone. `subjectCols` is REQUIRED (no
    * default), so registering store N+1 forces declaring its grain;
    * the audit column counts rows whose subject is missing from the
    * schema or NULL (an aggregate-of-unknown), plus whatever the
    * store's `grainCheck` finds — for the one aggregate-blob store
    * (ts_series) that is a decode-level count reconciliation against
    * the raw survivor corpus per (subject, type, day).
    */
  private[graft] final case class AuditedStore(
      site: String,
      store: String,
      erasedRoot: (SparkSession, String) => String,
      payload: String,
      refPred: DataFrame => Column,
      subjectCols: Seq[String],
      basePayloads: Seq[String],
      siblingBase: String,
      siblingPrefix: String,
      grainCheck: Option[(SparkSession, String, DataFrame) => Long] = None)

  /** The registry — one row per persisted payload of every erase
    * site. New erase verbs MUST add their store(s) here; the
    * Round18Spec completeness lock fails the build otherwise.
    */
  private[graft] val registry: Seq[AuditedStore] = Seq(
    AuditedStore("mf4", "mf4_econ",
      (s, d) => { Text.mf4EraseSurvivors(s, d); Text.mf4ErasedRoot(s, d) },
      "econ", df => df("doc_id") % 7 === 3, Seq("doc_id"),
      Seq("econ", "pairs"),
      "target/graft_text_store", "mf4era"),
    AuditedStore("mf4", "mf4_pairs",
      (s, d) => { Text.mf4EraseSurvivors(s, d); Text.mf4ErasedRoot(s, d) },
      "pairs", df => df("a") % 7 === 3 || df("b") % 7 === 3,
      Seq("a", "b"),
      Seq("econ", "pairs"),
      "target/graft_text_store", "mf4era"),
    AuditedStore("sppmi", "sppmi_pairs",
      (s, d) => Graph.erasedPairStoreRoot(s, d),
      "pairs.parquet",
      df => df("center") % 23 === 7 || df("context") % 23 === 7,
      Seq("center", "context"),
      Seq("pairs.parquet"),
      "target/graft_graph_store", "fullpairs"),
    AuditedStore("postings", "search_postings",
      (s, d) => Corpus.erasedPostingStoreRoot(s, d),
      "postings", df => df("doc_id") % 9 === 4, Seq("doc_id"),
      Seq("postings"),
      "target/stage_corpus", "fullpostings"),
    AuditedStore("passage", "passage_hashes",
      (s, d) => Text.erasedPassageStore(s, d),
      "store", df => df("w_doc") % 11 === 5, Seq("w_doc"),
      Seq("store"),
      "target/graft_text_store", "pdedup"),
    AuditedStore("minhash", "minhash_sigs",
      (s, d) => Dedup.erasedSigStore(s, d),
      "sigs", df => df("doc") % 13 === 6, Seq("doc"),
      Seq("sigs"),
      "target/stage_dedup", "sigstore"),
    AuditedStore("minhash", "minhash_ledger",
      (s, d) => Dedup.erasedSigStore(s, d),
      "ledger", df => df("doc_id") % 13 === 6, Seq("doc_id"),
      Seq("sigs"),
      "target/stage_dedup", "sigstore"),
    AuditedStore("servivf", "serving_index",
      (s, d) => Graph.erasedServingStore(s, d)._1,
      "index", df => df("vec_id") % 53 === 7, Seq("vec_id"),
      Seq("index", "cents"),
      "target/graft_graph_store", "servivf"),
    AuditedStore("cdc", "cdc_chunks",
      (s, d) => Dedup.erasedChunkStore(s, d),
      "chunks", df => df("w_doc") % 17 === 2, Seq("w_doc"),
      Seq("chunks"),
      "target/stage_dedup", "cdcstore"),
    AuditedStore("tsstore", "ts_series",
      (s, d) => Events.erasedTsStore(s, d),
      "series", df => df("user_id") % 19 === 3, Seq("user_id"),
      Seq("series"),
      "target/stage_events", "tsstore",
      // the ONE aggregate-blob store: prove at decode level that each
      // blob holds exactly its own (user, type, day) group's points
      // over the survivor corpus — a blob that absorbed another
      // subject's points, or silently kept an erased subject's, breaks
      // the count reconciliation (the q349 hourly-arm hazard, audited)
      grainCheck = Some((s, d, payload) => {
        val dec = payload
          .withColumn("blk", expr("ts_min DIV 86400000000"))
          .withColumn("n_dec",
            size(graft.functions.Gorilla.decode(s, col("bin"))
              .getField("ts")).cast("long"))
        val raw = graft.Tables.events(s, d)
          .where(col("user_id") % 19 =!= 3)
          .groupBy(col("user_id"), col("event_type"),
            expr("unix_micros(ts) DIV 86400000000").as("blk"))
          .agg(count(lit(1)).as("n_raw"))
        dec.join(raw, Seq("user_id", "event_type", "blk"), "full")
          .where(col("n_dec").isNull || col("n_raw").isNull ||
            col("n_dec") =!= col("n_raw") || col("n") =!= col("n_raw"))
          .count()
      })),
  )

  /** Audit ledger over a registry — factored so Round18Spec can run
    * the identical code path over a fixture whose stores are NOT all
    * clean and watch the certificate fail.
    */
  private[graft] def auditFrame(
      s: SparkSession, d: String,
      stores: Seq[AuditedStore]): DataFrame = {
    import s.implicits._
    val conf = s.sparkContext.hadoopConfiguration
    // one erase-transaction run per SITE: multi-payload sites (mf4,
    // minhash) register several rows sharing one verb — re-running the
    // verb per row would repeat its sweep + steady-state vacuum I/O
    val rootBySite = stores.map(_.site).distinct.map { site =>
      site -> stores.find(_.site == site).get.erasedRoot(s, d)
    }.toMap
    val rows = stores.map { a =>
      val root = rootBySite(a.site)
      val payload = s.read.parquet(s"$root/${a.payload}")
      val nRefs = payload.where(a.refPred(payload)).count()
      val base = root.substring(0, root.lastIndexOf('/'))
      val resident = a.basePayloads.count { p =>
        val hp = new org.apache.hadoop.fs.Path(s"$base/$p")
        hp.getFileSystem(conf).exists(hp)
      }
      // superseded freshness-tagged SIBLING roots: a stale sibling is
      // a retained pre-erase copy — the sweep must have removed it.
      // r21: scoped to THIS source dir's tag, mirroring the sweep —
      // a same-prefix sibling keyed to ANOTHER source dir is that SF's
      // live store, not residue of this one (the old any-sibling rule
      // is what made SF-alternating runs destroy each other's stores);
      // pre-migration single-tag roots are unconditionally stale.
      val liveName = base.substring(base.lastIndexOf('/') + 1)
      val scoped = s"${a.siblingPrefix}_${StoreGuard.dirTag(d)}_"
      val oldFormat =
        s"^${java.util.regex.Pattern.quote(a.siblingPrefix)}_[0-9a-f]+$$".r
      val bp = new org.apache.hadoop.fs.Path(a.siblingBase)
      val bfs = bp.getFileSystem(conf)
      val nStale =
        if (!bfs.exists(bp)) 0L
        else bfs.listStatus(bp).count { st =>
          val n = st.getPath.getName
          st.isDirectory &&
            ((n.startsWith(scoped) && n != liveName) ||
              oldFormat.findFirstIn(n).nonEmpty)
        }.toLong
      // subject-grain violations (r18 verdict item 4): rows whose
      // erasure subject is absent from the schema (the whole payload
      // violates — a row-drop erase cannot even express the predicate)
      // or NULL (an aggregate-of-unknown), plus the store's own
      // physical grain proof where registered
      val nGrain = {
        val missing = a.subjectCols.filterNot(payload.columns.contains)
        val structural =
          if (a.subjectCols.isEmpty || missing.nonEmpty) payload.count()
          else {
            val anyNull = a.subjectCols
              .map(payload(_).isNull).reduce(_ || _)
            payload.where(anyNull).count()
          }
        structural + a.grainCheck.map(f => f(s, d, payload)).getOrElse(0L)
      }
      (a.store, nRefs, resident.toLong, nStale, nGrain)
    }
    rows.toDF("store", "n_erased_refs", "n_base_resident",
        "n_stale_siblings", "n_grain_violations")
      .orderBy($"store")
  }

  private def q338(s: SparkSession, d: String): DataFrame =
    auditFrame(s, d, registry)

  private val q338Sql =
    """SELECT t.*, CAST(0 AS BIGINT) AS n_stale_siblings,
      |  CAST(0 AS BIGINT) AS n_grain_violations
      |FROM (VALUES
      |  ('cdc_chunks',      CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
      |  ('mf4_econ',        CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
      |  ('mf4_pairs',       CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
      |  ('minhash_ledger',  CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
      |  ('minhash_sigs',    CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
      |  ('passage_hashes',  CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
      |  ('search_postings', CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
      |  ('serving_index',   CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
      |  ('sppmi_pairs',     CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
      |  ('ts_series',       CAST(0 AS BIGINT), CAST(0 AS BIGINT))
      |) AS t(store, n_erased_refs, n_base_resident)
      |ORDER BY store""".stripMargin

  val all: Seq[QueryDef] = Seq(
    // the audit's power is the disk scan + the Round18Spec negative
    // fixture; the SQL side pins the schema and the all-zero contract
    QueryDef("q338_erasure_audit", q338, Some(q338Sql)),
  )
}
