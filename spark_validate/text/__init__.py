from spark_validate.text.dedup import (
    exact_duplicates,
    exact_duplicate_members,
    minhash_signatures,
    lsh_candidate_pairs,
    ngram_jaccard,
    simhash,
    simhash_near_duplicates,
    near_duplicate_clusters,
)
from spark_validate.text.decontaminate import benchmark_ngrams, ngram_overlap
from spark_validate.text.sampling import (
    deterministic_sample,
    hash_bucket,
    mixture_sample,
    rate_to_hex,
    solve_mixture_rates,
    stratified_sample,
    with_split,
)
from spark_validate.text.packing import (
    pack_sequences,
    pack_sequences_greedy,
    packing_stats,
)
from spark_validate.text.boilerplate import BoilerplateCheck, common_ngram_rate
from spark_validate.text.curate import CurationResult, curate
from spark_validate.text.pii import PII_PATTERNS, PiiRateCheck, redact_pii, with_pii_counts
from spark_validate.text.lm import LMQualityCheck, NgramLMQuality
from spark_validate.text.urls import (
    URL_PATTERN,
    UrlBlocklistCheck,
    blocklist_filter,
    with_blocklist_flags,
    with_urls,
)
from spark_validate.text.quality import (
    with_bpe_token_count,
    with_text_features,
    with_language_id,
    with_quality_score,
    with_fingerprint,
    repetition_stats,
    RepetitionCheck,
    GOPHER_REPETITION_RULES,
)

__all__ = [
    "benchmark_ngrams",
    "ngram_overlap",
    "deterministic_sample",
    "hash_bucket",
    "mixture_sample",
    "rate_to_hex",
    "solve_mixture_rates",
    "stratified_sample",
    "with_split",
    "pack_sequences",
    "pack_sequences_greedy",
    "packing_stats",
    "exact_duplicates",
    "exact_duplicate_members",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "ngram_jaccard",
    "simhash",
    "simhash_near_duplicates",
    "near_duplicate_clusters",
    "with_bpe_token_count",
    "with_text_features",
    "with_language_id",
    "with_quality_score",
    "with_fingerprint",
    "repetition_stats",
    "RepetitionCheck",
    "GOPHER_REPETITION_RULES",
    "BoilerplateCheck",
    "common_ngram_rate",
    "CurationResult",
    "curate",
    "PII_PATTERNS",
    "PiiRateCheck",
    "redact_pii",
    "with_pii_counts",
    "LMQualityCheck",
    "NgramLMQuality",
    "URL_PATTERN",
    "UrlBlocklistCheck",
    "blocklist_filter",
    "with_blocklist_flags",
    "with_urls",
]
