from credigraph_spark.pipeline.dedup import (  # noqa: F401
    dedup_canonical,
    dup_span_stats,
    exact_dedup,
    jaccard_prefix_pairs,
    shingles,
    minhash_signatures,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dups,
)
from credigraph_spark.pipeline.ivf import (  # noqa: F401
    assign_lists,
    ivf_topk,
    kmeans_assign,
    refine_centroids,
    refine_centroids_exact,
    seed_centroids,
)
from credigraph_spark.pipeline.similarity import (  # noqa: F401
    ann_recall_at_k,
    cosine_topk_bruteforce,
    embedding_near_dup_pairs,
    lsh_bucketed_topk,
    quantize_int8_stats,
)
from credigraph_spark.pipeline.pq import (  # noqa: F401
    ivfpq_topk,
    pq_adc_topk,
    pq_codebooks,
    pq_encode,
    refine_codebooks,
)
from credigraph_spark.pipeline.sampling import (  # noqa: F401
    hash_split,
    stratified_sample,
    weighted_sample,
)
from credigraph_spark.pipeline.textstats import (  # noqa: F401
    benchmark_contamination,
    c4_line_stats,
    char_entropy,
    dsir_importance,
    gopher_quality,
    line_dedup_stats,
    pmi_top_pairs,
    text_quality,
    tfidf_top_terms,
    language_id,
    document_fingerprint,
    repetition_stats,
)
