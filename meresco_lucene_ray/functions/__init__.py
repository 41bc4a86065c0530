from . import textstats, dedup, ann, multimodal  # noqa: F401
