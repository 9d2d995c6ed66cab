from moloch_spark.operators.endpoints import (
    connections,
    connections_baseline,
    dsum,
    multiunique,
    sessions_search,
    spigraph,
    spigraph_hierarchy,
    spiview,
    timeline,
    unique,
)

__all__ = [
    "connections",
    "connections_baseline",
    "dsum",
    "multiunique",
    "sessions_search",
    "spigraph",
    "spigraph_hierarchy",
    "spiview",
    "timeline",
    "unique",
]
