from . import (  # noqa: F401
    asof,
    dedup,
    ewm,
    indicators,
    joins,
    labels,
    orderbook,
    resample,
    rolling,
    similarity,
    text,
)
