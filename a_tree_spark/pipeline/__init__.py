from .checkpoint import StageCheckpoint
from .dedup import (
    corpus_with_dups,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_oracle,
    simhash_signatures,
)
from .multimodal import (
    decode_stub,
    extract_media_features,
    media_metadata,
    media_table,
    sample_frames,
)
from .similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    lsh_topk,
)
from .text import text_features

__all__ = [
    "StageCheckpoint",
    "brute_force_topk",
    "corpus_with_dups",
    "decode_stub",
    "embedding_near_dup_pairs",
    "exact_duplicates",
    "extract_media_features",
    "lsh_topk",
    "media_metadata",
    "media_table",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "sample_frames",
    "simhash_oracle",
    "simhash_signatures",
    "text_features",
]
