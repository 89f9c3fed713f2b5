from . import clean, dedup, multimodal, relational, similarity, textstats  # noqa: F401
