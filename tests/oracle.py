"""Pure-Python mirror of the reference's search semantics, used as the parity
oracle for the device kernels.  Implements SearchResults.incr/finish
(/root/reference/src/common.zig:121-167), segment-scan hit counting
(FileSegment.zig / MemorySegment.zig) and hasNewerCommit supersession
(Index.zig:133-149) literally, with no vectorization tricks.
"""

from bisect import bisect_left, bisect_right


class OracleSegment:
    def __init__(self, items, docs):
        # items: list[(hash, docid)] sorted by (hash, docid)
        # docs: dict[docid -> alive] (False = tombstone)
        self.items = sorted(items)
        self.docs = dict(docs)
        self.hash_keys = [h for h, _ in self.items]

    def postings(self, h):
        lo = bisect_left(self.hash_keys, h)
        hi = bisect_right(self.hash_keys, h)
        return [d for _, d in self.items[lo:hi]]


def oracle_search(segments, query, limit=10, min_score=1, pct=10):
    """segments: oldest -> newest. Returns [(id, score)] like finish()."""
    hashes = sorted(set(query))
    hits = {}  # docid -> [ordinal, score]
    for ordinal, seg in enumerate(segments):
        for h in hashes:
            for docid in seg.postings(h):
                prev = hits.get(docid)
                if prev is None or prev[0] < ordinal:
                    hits[docid] = [ordinal, 1]
                elif prev[0] == ordinal:
                    prev[1] += 1

    candidates = [
        (docid, score, ordinal)
        for docid, (ordinal, score) in hits.items()
        if score >= min_score
    ]
    candidates.sort(key=lambda t: (-t[1], t[0]))

    out = []
    ms = min_score
    for docid, score, ordinal in candidates:
        if len(out) == limit:
            break
        if any(
            docid in segments[t].docs for t in range(ordinal + 1, len(segments))
        ):
            continue  # superseded by a newer mention; keep scanning
        if score < ms:
            break
        if not out:
            ms = max(ms, score * pct // 100)
        out.append((docid, score))
    return out
