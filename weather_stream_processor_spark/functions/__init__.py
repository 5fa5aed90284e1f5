from weather_stream_processor_spark.functions.text_features import (
    cosine_similarity,
    dot,
    l2_norm,
    tokens,
    word_ngrams,
    word_shingles,
)

__all__ = ["cosine_similarity", "dot", "l2_norm", "tokens", "word_ngrams", "word_shingles"]
