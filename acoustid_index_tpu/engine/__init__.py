"""Single-index engine: change model, device term tables, snapshots, WAL,
segment files, manifest, tiered merges, and the Index orchestrator."""

from .model import (
    Change,
    Insert,
    Delete,
    SetMetadata,
    Transaction,
    SegmentInfo,
    SearchOptions,
    SearchResult,
)

__all__ = [
    "Change",
    "Insert",
    "Delete",
    "SetMetadata",
    "Transaction",
    "SegmentInfo",
    "SearchOptions",
    "SearchResult",
]
