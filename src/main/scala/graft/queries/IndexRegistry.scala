package graft.queries

/** Registry of every built-once corpus index the engine caches
  * (VERDICT r10 item 1: "price the built-once index channel").
  *
  * An "index" here is an ingest-time artifact: a deterministic,
  * persisted DataFrame built ONCE per (session, dataset) and read by
  * many queries — the Spark-session analog of the bucketed tables a
  * production pipeline materializes at corpus ingest (SCALING.md). The
  * reference engine re-derives these intermediates inside every query;
  * this engine builds them once, so their build cost must be priced
  * explicitly instead of hiding outside the bench ratios:
  *
  *  - every cache keys itself through [[IndexCache.key]]`("<prefix>")`
  *    — `prefix` is the registry id, and IndexRegistrySpec scans main
  *    sources so an unregistered cache (or a registry row without a
  *    cache) fails the build, the EVENTS.md/EventsSpec discipline;
  *  - builds are timed per index ([[IndexCache.timedBuild]], nested
  *    builds subtracted) and consumers recorded per query
  *    ([[IndexCache.noteAccess]]), feeding Bench's
  *    `warm_solo_plus_build` / `warm_solo_plus_amortized_build`
  *    channels and the generated INDEXES.md ledger
  *    (`runMain graft.tools.IndexesMd`).
  */
final case class IndexDef(
    /** cache-key prefix == registry id (see IndexCache.key) */
    prefix: String,
    /** builder site, file:function */
    site: String,
    /** what the artifact is */
    description: String,
    /** how the artifact absorbs NEW data without a full rebuild —
      * the amortization argument, named mechanism by mechanism */
    maintenance: String)

object IndexRegistry {

  val all: Seq[IndexDef] = Seq(
    IndexDef("sig", "TextOps.corpusSig",
      "MinHash signature table (doc_id, h0..h11) over 3-word shingles",
      "new docs sign independently (per-doc aggregate, O(batch) append); " +
        "q69 probes a fresh batch against the frozen table"),
    IndexDef("pairs", "TextOps.shingleOverlapPairs",
      "shingle posting-list overlap pair table (doc_a, doc_b, na, nb, common), " +
        "stop-shingle capped",
      "incremental base+delta merge proven bit-equal to a recount by q171; " +
        "streaming twin maintainPairIndex (m43)"),
    IndexDef("jaccpairs", "Ext4.jaccardPairs",
      "PPJoin-verified exact-Jaccard >= 0.6 pair table (candidate-bounded)",
      "pair-table delta-merge (same shape the q171 gate proves for `pairs`); " +
        "rebuild is candidate-bounded, not corpus-quadratic"),
    IndexDef("bpe", "TextOps.bpeSpells",
      "trained BPE merge table (500 merges) + word spellings",
      "training artifact: frozen once trained; new text ENCODES against it " +
        "(q90) without touching the table; retrain is a scheduled ingest job"),
    IndexDef("simhash", "TextOps.simhashes",
      "32-bit SimHash per doc (word-hash sign aggregation)",
      "per-doc computation: new docs hash independently, O(batch) append"),
    IndexDef("simhash64", "TextOps.simhashes64",
      "64-bit SimHash + 4 pigeonhole band keys per doc",
      "q112 proves the incremental probe: a new batch joins the frozen " +
        "band index, O(batch x bucket) per ingest"),
    IndexDef("cc02", "TextOps.dedupComponents",
      "connected near-dup components (union-find over the pair table)",
      "recomputed from the MAINTAINED pair index (pointer-jumping passes " +
        "are pair-count-bounded); q48/q97 read the components"),
    IndexDef("ccsurv", "Ext2 (q57 pipeline)",
      "connected near-dup components over the exact-dedup survivors " +
        "(min-label fixpoint over survivor-pairs)",
      "recomputed from the MAINTAINED survivor-pair index exactly like " +
        "cc02 from `pairs`; rounds are pair-count-bounded, survivors " +
        "change only by append"),
    IndexDef("exact-kept", "Ext2 (q57 pipeline)",
      "exact-dedup survivor set (first doc per normalized-text hash)",
      "hash-keyed: a new batch md5-joins the survivor set, O(batch) merge"),
    IndexDef("survivor-pairs", "Ext2 (q57 pipeline)",
      "shingle-overlap pair table over the exact-dedup survivors",
      "same delta-merge shape as `pairs` (q171); survivors change only by " +
        "append, so the delta is the new-survivor pair set"),
    IndexDef("copairs", "Ext3.coPairs",
      "support-pruned co-purchase part pairs (pa < pb, co-count >= 2)",
      "ingest refresh of a bucketed pairs table (SCALING.md); co-counts " +
        "are additive, so a delta batch merges by (pa, pb) key"),
    IndexDef("predges", "Ext3.coEdges",
      "undirected co-purchase edge list (distinct src/dst part pairs)",
      "additive by construction: new orders contribute new edges via one " +
        "delta self-join, merged distinct"),
    IndexDef("prdeg", "Ext3.coDegrees",
      "node out-degrees over predges (one row per part)",
      "node-sized degree aggregate; deltas ride the predges delta " +
        "(sum-merge per src)"),
    IndexDef("imgassets", "Ext2 via Multimodal.imageAssetsFromDocuments",
      "decoded PNG asset table (pixels + typed metadata)",
      "decode-at-ingest artifact: new assets decode independently (append)"),
    IndexDef("imgthumbs", "Ext2 via Multimodal.thumbnailAssets",
      "image thumbnail/feature table derived from imgassets",
      "derived per-asset: appends ride the imgassets delta"),
    IndexDef("wavassets", "Ext2 via Multimodal.audioAssetsFromDocuments",
      "decoded WAV asset table (samples + typed metadata)",
      "decode-at-ingest artifact: new assets decode independently (append)"),
    IndexDef("wavthumbs", "Ext2 via Multimodal.audioThumbnails",
      "audio fingerprint/thumbnail table derived from wavassets",
      "derived per-asset: appends ride the wavassets delta"),
    IndexDef("vidassets", "Ext2 via Multimodal.videoAssetsFromDocuments",
      "decoded Y4M asset table (frames + typed metadata)",
      "decode-at-ingest artifact: new assets decode independently (append)"),
    IndexDef("vidthumbs", "Ext2 via Multimodal.videoThumbnails",
      "video signature/thumbnail table derived from vidassets",
      "derived per-asset: appends ride the vidassets delta"),
    IndexDef("ivf", "Similarity.ivfIndex",
      "IVF index: trained centroids + per-vector 2-nearest-cell assignment",
      "q104 proves incremental assign of new vectors against FROZEN " +
        "centroids (O(batch x K)); retrain is a scheduled ingest job " +
        "(sample-trained, constant cost past ~524k vectors)"),
    IndexDef("cellpair", "Similarity.cellPairIndex",
      "unthresholded within-cell cosine pair table over the IVF assignment",
      "new vectors pair only within their assigned cell (q104's assign " +
        "gives the cell; delta pairs are batch x cell-bounded)"),
    IndexDef("pq", "Similarity.pqIndex",
      "PQ codebooks (2 subspaces x 16 centroids) + per-vector codes",
      "codebooks frozen post-train; new vectors encode via one broadcast " +
        "assign pass (O(batch x 32)); q73/q225 serve from codes"),
    IndexDef("kmold", "Similarity (q104)",
      "historical-corpus k-means centroids (the q104 'old index' fixture)",
      "frozen by definition: it IS the historical artifact q104 updates " +
        "incrementally against"))

  val prefixes: Set[String] = all.map(_.prefix).toSet
  require(prefixes.size == all.size, "duplicate index prefixes in registry")
}
