from .labels import (
    construct_label_1d,
    parse_label_1d,
    pad_label,
    frame_count,
    MAX_SEGMENTS,
    SEGMENT_MS,
)
from .reader import InteractionTable, SeqReader
from .dataset import BatchIterator

__all__ = [
    "construct_label_1d",
    "parse_label_1d",
    "pad_label",
    "frame_count",
    "MAX_SEGMENTS",
    "SEGMENT_MS",
    "InteractionTable",
    "SeqReader",
    "BatchIterator",
]
