"""Segment file format — raw columnar arrays for zero-decode loads.

The reference compresses postings into 512-byte StreamVByte blocks
(/root/reference/src/filefmt.zig, block.zig) because its search decodes
blocks on the CPU per query.  Here search reads HBM-resident uncompressed
arrays, so the on-disk format is the device format: little-endian u32
columns that np.frombuffer can map straight into the packed device view —
load is one read + CRC check, no decode step.

Layout ("ATS1"):
    magic "ATS1"
    u32 header_len, msgpack header {
        "info": [commit_id, merges, version|nil],
        "metadata": {k: v},
        "num_items": N, "num_docs": M,
        "min_doc_id": int, "max_doc_id": int,
        "crc": crc32 of the payload bytes,
    }
    hashes    u32[N] LE
    docids    u32[N] LE
    docs_ids  u32[M] LE
    docs_alive u8[M]
    u32 footer = crc32(header bytes)  (written last: presence = complete file)

Writes are atomic: temp file + fsync + rename, like the reference
(filefmt.zig:183-203). Reads verify magic, counts and checksums.
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Optional

import msgpack
import numpy as np

from .memseg import Segment
from .model import SegmentInfo

MAGIC = b"ATS1"
U32 = struct.Struct("<I")


def segment_file_name(info: SegmentInfo) -> str:
    return f"{info.commit_id:016x}-{info.merges:08x}.seg"


def write_segment(dir_path: str, segment: Segment) -> str:
    """Atomically write `segment`; returns the file name."""
    name = segment_file_name(segment.info)
    tmp = os.path.join(dir_path, name + ".tmp")
    final = os.path.join(dir_path, name)

    hashes = np.ascontiguousarray(segment.hashes, dtype="<u4").tobytes()
    docids = np.ascontiguousarray(segment.docids, dtype="<u4").tobytes()
    docs_ids = np.ascontiguousarray(segment.docs_ids, dtype="<u4").tobytes()
    docs_alive = np.ascontiguousarray(segment.docs_alive, dtype=np.uint8).tobytes()

    crc = 0
    for part in (hashes, docids, docs_ids, docs_alive):
        crc = zlib.crc32(part, crc)

    header = msgpack.packb(
        {
            "info": segment.info.to_wire(),
            "metadata": dict(segment.metadata),
            "num_items": segment.num_items,
            "num_docs": segment.num_docs,
            "min_doc_id": segment.min_doc_id,
            "max_doc_id": segment.max_doc_id,
            "crc": crc,
        },
        use_bin_type=True,
    )

    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(U32.pack(len(header)))
        f.write(header)
        f.write(hashes)
        f.write(docids)
        f.write(docs_ids)
        f.write(docs_alive)
        f.write(U32.pack(zlib.crc32(header)))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final)
    return name


def read_segment(dir_path: str, info: SegmentInfo) -> Segment:
    path = os.path.join(dir_path, segment_file_name(info))
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != MAGIC:
        raise ValueError(f"bad segment magic in {path}")
    (header_len,) = U32.unpack_from(data, 4)
    header_start = 8
    header_bytes = data[header_start : header_start + header_len]
    hdr = msgpack.unpackb(header_bytes, strict_map_key=False)
    file_info = SegmentInfo.from_wire(hdr["info"])
    if (file_info.commit_id, file_info.merges) != (info.commit_id, info.merges):
        raise ValueError(f"segment identity mismatch in {path}: {file_info} != {info}")

    n = hdr["num_items"]
    m = hdr["num_docs"]
    pos = header_start + header_len
    end = pos + 4 * n + 4 * n + 4 * m + m
    payload = data[pos:end]
    if len(payload) != end - pos:
        raise ValueError(f"truncated segment file {path}")
    if zlib.crc32(payload) != hdr["crc"]:
        raise ValueError(f"segment payload checksum mismatch in {path}")
    (footer,) = U32.unpack_from(data, end)
    if footer != zlib.crc32(header_bytes):
        raise ValueError(f"segment footer checksum mismatch in {path}")

    hashes = np.frombuffer(payload, dtype="<u4", count=n, offset=0).astype(np.uint32)
    docids = np.frombuffer(payload, dtype="<u4", count=n, offset=4 * n).astype(np.uint32)
    docs_ids = np.frombuffer(payload, dtype="<u4", count=m, offset=8 * n).astype(np.uint32)
    docs_alive = np.frombuffer(payload, dtype=np.uint8, count=m, offset=8 * n + 4 * m).astype(bool)

    return Segment(
        info=file_info,
        hashes=hashes,
        docids=docids,
        docs_ids=docs_ids,
        docs_alive=docs_alive,
        min_doc_id=hdr["min_doc_id"],
        max_doc_id=hdr["max_doc_id"],
        metadata=tuple(hdr.get("metadata", {}).items()),
    )


def delete_segment_file(dir_path: str, info: SegmentInfo) -> None:
    try:
        os.unlink(os.path.join(dir_path, segment_file_name(info)))
    except FileNotFoundError:
        pass


def segment_file_size(dir_path: str, info: SegmentInfo) -> Optional[int]:
    try:
        return os.path.getsize(os.path.join(dir_path, segment_file_name(info)))
    except FileNotFoundError:
        return None
