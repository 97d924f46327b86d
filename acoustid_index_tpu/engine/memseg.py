"""Host-side segment representation and construction.

A segment is an immutable sorted (hash, docid) term table plus a sorted
"mentioned docs" table (docid -> alive/tombstone), its commit-id interval,
and metadata.  The same structure backs both tiers: memory segments are
built from write batches; file segments are the same thing loaded from disk
(filefmt.py).  Device packing for search lives in segments.py.

Build semantics mirror /root/reference/src/MemorySegment.zig:81-148: the
batch is scanned in reverse with first-occurrence-wins per id (so the LAST
change for an id in a batch wins), duplicate hashes within an insert are
kept (they score twice, exactly like the reference's postings), deletes
record tombstones, and metadata is applied forward (last write wins).

Merging mirrors /root/reference/src/segment_merger.zig: a doc shadowed by a
*newer commit anywhere in the collection* is skipped (its postings and its
docs-map entry both), tombstones of non-shadowed docs are kept so they keep
shadowing older file segments.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Iterable, Optional, Sequence, Tuple

import numpy as np

from .model import Change, Delete, Insert, SegmentInfo, SetMetadata


@dataclass(frozen=True)
class Segment:
    info: SegmentInfo
    hashes: np.ndarray  # u32[n], sorted by (hash, docid)
    docids: np.ndarray  # u32[n]
    docs_ids: np.ndarray  # u32[m], sorted; every doc mentioned (insert or delete)
    docs_alive: np.ndarray  # bool[m]; False = tombstone
    min_doc_id: int
    max_doc_id: int
    metadata: Tuple[Tuple[str, str], ...] = ()

    @property
    def num_items(self) -> int:
        return int(self.hashes.shape[0])

    @property
    def num_docs(self) -> int:
        # Counts tombstones, like the reference's docs.count().
        return int(self.docs_ids.shape[0])

    def get_size(self) -> int:
        return self.num_items

    def mentions(self, doc_id: int) -> bool:
        i = np.searchsorted(self.docs_ids, np.uint32(doc_id))
        return bool(i < self.docs_ids.shape[0] and self.docs_ids[i] == doc_id)

    def doc_alive(self, doc_id: int) -> Optional[bool]:
        i = int(np.searchsorted(self.docs_ids, np.uint32(doc_id)))
        if i < self.docs_ids.shape[0] and self.docs_ids[i] == doc_id:
            return bool(self.docs_alive[i])
        return None

    def metadata_dict(self) -> Dict[str, str]:
        return dict(self.metadata)


def _sort_items(hashes: np.ndarray, docids: np.ndarray):
    # Lexicographic (hash, docid) — the u64 key order of segment.zig's Item.
    order = np.lexsort((docids, hashes))
    return np.ascontiguousarray(hashes[order]), np.ascontiguousarray(docids[order])


def build_segment(changes: Sequence[Change], info: SegmentInfo) -> Segment:
    """Build a segment from one write batch (MemorySegment.build)."""
    seen: Dict[int, bool] = {}
    hash_chunks = []
    id_chunks = []
    for change in reversed(changes):
        if isinstance(change, Insert):
            if change.id in seen:
                continue
            seen[change.id] = True
            if change.hashes:
                h = np.asarray(change.hashes, dtype=np.uint32)
                hash_chunks.append(h)
                id_chunks.append(np.full(h.shape, change.id, dtype=np.uint32))
        elif isinstance(change, Delete):
            if change.id in seen:
                continue
            seen[change.id] = False
        elif isinstance(change, SetMetadata):
            continue
        else:
            raise TypeError(f"not a Change: {change!r}")

    if hash_chunks:
        hashes = np.concatenate(hash_chunks)
        docids = np.concatenate(id_chunks)
        hashes, docids = _sort_items(hashes, docids)
    else:
        hashes = np.empty(0, dtype=np.uint32)
        docids = np.empty(0, dtype=np.uint32)

    if seen:
        docs_ids = np.fromiter(seen.keys(), dtype=np.uint32, count=len(seen))
        alive = np.fromiter(seen.values(), dtype=bool, count=len(seen))
        order = np.argsort(docs_ids, kind="stable")
        docs_ids = docs_ids[order]
        docs_alive = alive[order]
        min_doc = int(docs_ids[0])
        max_doc = int(docs_ids[-1])
    else:
        docs_ids = np.empty(0, dtype=np.uint32)
        docs_alive = np.empty(0, dtype=bool)
        min_doc = 0
        max_doc = 0

    metadata: Dict[str, str] = {}
    for change in changes:
        if isinstance(change, SetMetadata):
            for k, v in change.entries:
                metadata[k] = v

    return Segment(
        info=info,
        hashes=hashes,
        docids=docids,
        docs_ids=docs_ids,
        docs_alive=docs_alive,
        min_doc_id=min_doc,
        max_doc_id=max_doc,
        metadata=tuple(metadata.items()),
    )


def merge_segments(sources: Sequence[Segment], has_newer_commit) -> Segment:
    """Merge adjacent segments into one (segment_merger.zig semantics).

    `has_newer_commit(doc_id, commit_id) -> bool` must answer against the
    WHOLE collection the merge happens inside, not just `sources` — a doc
    rewritten in a segment outside the merged range is dropped here too.
    """
    assert sources, "no sources"
    info = sources[0].info
    for s in sources[1:]:
        info = info.merge(s.info)

    metadata: Dict[str, str] = {}
    for s in sources:  # oldest -> newest, newest key wins
        metadata.update(s.metadata)

    kept_docs: Dict[int, bool] = {}
    hash_chunks = []
    id_chunks = []
    for s in sources:
        mask = np.fromiter(
            (
                not has_newer_commit(int(doc), s.info.commit_id)
                for doc in s.docs_ids
            ),
            dtype=bool,
            count=s.docs_ids.shape[0],
        )
        for doc, alive in zip(s.docs_ids[mask], s.docs_alive[mask]):
            kept_docs[int(doc)] = bool(alive)
        if s.num_items:
            keep_ids = set(int(d) for d in s.docs_ids[mask])
            item_mask = np.fromiter(
                (int(d) in keep_ids for d in s.docids), dtype=bool, count=s.num_items
            )
            hash_chunks.append(s.hashes[item_mask])
            id_chunks.append(s.docids[item_mask])

    if hash_chunks:
        hashes = np.concatenate(hash_chunks)
        docids = np.concatenate(id_chunks)
        hashes, docids = _sort_items(hashes, docids)
    else:
        hashes = np.empty(0, dtype=np.uint32)
        docids = np.empty(0, dtype=np.uint32)

    if kept_docs:
        docs_ids = np.fromiter(kept_docs.keys(), dtype=np.uint32, count=len(kept_docs))
        alive = np.fromiter(kept_docs.values(), dtype=bool, count=len(kept_docs))
        order = np.argsort(docs_ids, kind="stable")
        docs_ids = docs_ids[order]
        docs_alive = alive[order]
        min_doc = int(docs_ids[0])
        max_doc = int(docs_ids[-1])
    else:
        docs_ids = np.empty(0, dtype=np.uint32)
        docs_alive = np.empty(0, dtype=bool)
        min_doc = 0
        max_doc = 0

    return Segment(
        info=info,
        hashes=hashes,
        docids=docids,
        docs_ids=docs_ids,
        docs_alive=docs_alive,
        min_doc_id=min_doc,
        max_doc_id=max_doc,
        metadata=tuple(metadata.items()),
    )
