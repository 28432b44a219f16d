package graft.pipeline

/** Deduplication operators for 100 TB training-data pipelines.
  *
  * Scale design: every variant is bucketed — content-hash `groupBy` for
  * exact dups, banded MinHash buckets for near-dups, SimHash prefix buckets,
  * length-bucketed blocking for n-gram Jaccard — so no operator ever
  * materializes the full cross product. Shuffles are on hash keys with
  * near-uniform distribution; skew on popular buckets is bounded by
  * `maxBucketSize` guards.
  *
  * The implementation lives in one file per family — [[ExactDedupOps]],
  * [[MinhashDedupOps]], [[NgramDedupOps]], [[SimhashDedupOps]],
  * [[EmbeddingDedupOps]], [[SemanticDedupOps]] — over the shared
  * candidate/verify core ([[DedupCoreOps]]); this object composes them
  * so every call site keeps its `Dedup.x` spelling.
  */
object Dedup extends DedupCoreOps with ExactDedupOps with MinhashDedupOps
  with NgramDedupOps with SimhashDedupOps with EmbeddingDedupOps
  with SemanticDedupOps
