from . import (  # noqa: F401
    clean,
    dedup,
    graph,
    layout,
    multimodal,
    profile,
    relational,
    similarity,
    sketch,
    textstats,
)
