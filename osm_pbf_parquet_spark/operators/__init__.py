"""Engine operators: the reference's library entry points re-expressed as
DataFrame transformations, plus the large-scale training-data operator
suite (dedup, similarity, text analysis, multimodal)."""
