"""End-to-end pipelines.

    kg          transcripts → mentions → linked entities → (subj,pred,obj) triples
    scorecard   per-seller aggregate metrics (reference metrics_calculator semantics)
    dedup       exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup over documents
    similarity  brute-force + LSH-bucketed cosine top-k over embeddings
    textstats   language-ID, quality scoring, token counts, fingerprints
    relational  generic relational ops over the TPC-H-ish test tables
"""
