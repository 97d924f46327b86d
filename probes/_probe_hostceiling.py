"""Standalone host-path ceiling microbench + per-stage attribution (CPU,
device removed): what does one query cost in host work through the
batching pipeline?  Compares directly with bench.py's e2e_hostonly_qps.

Round-5 result (idle 1-core dev box, 12 s): 18,582 qps; per-request
stages prepare_query 12.3us, pack_rows 0.22us, materialize_row 4.1us,
submit+claim 29.7us => ~46us serialized Python ~= 21.7k qps GIL-serial
ceiling.  See SERVING.md "The r3->r4 e2e_hostonly_qps regression".

    python probes/_probe_hostceiling.py
"""
import os, sys, time, threading, queue
os.environ["AITPU_JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

from acoustid_index_tpu.engine.memseg import build_segment
from acoustid_index_tpu.engine.model import BulkInsert, Insert, SearchOptions, SegmentInfo
from acoustid_index_tpu.engine.searcher import BATCH_SIZES, BatchingSearcher, _params_for
from acoustid_index_tpu.engine.segments import FILE_SLOTS, MEMORY_SLOTS, Snapshot, pack_tier

HASHES_PER_DOC = 24
N = 100_000
def doc_hashes(ids, n):
    j = np.arange(n, dtype=np.uint32)
    with np.errstate(over="ignore"):
        h = ids.astype(np.uint32)[:, None] * np.uint32(2654435761)
        h = h + j[None, :] * np.uint32(0x27D4EB2F) + np.uint32(12345)
        h = h ^ (h >> np.uint32(13)); h = h * np.uint32(0x85EBCA6B); h = h ^ (h >> np.uint32(16))
    return h.astype(np.uint32)

ids = np.arange(1, N+1, dtype=np.uint32)
hs = doc_hashes(ids, HASHES_PER_DOC)
offsets = np.arange(0, (N+1)*HASHES_PER_DOC, HASHES_PER_DOC, dtype=np.uint32)
seg = build_segment([BulkInsert(ids=ids, hashes=hs.reshape(-1), offsets=offsets)], SegmentInfo(commit_id=1))
snap = Snapshot(file=(seg,), memory=(),
                file_view=pack_tier([seg], FILE_SLOTS),
                mem_view=pack_tier([], MEMORY_SLOTS))
searcher = BatchingSearcher()
options = SearchOptions(max_results=40, min_score=6, min_score_pct=10)
rng = np.random.default_rng(5)

q0 = np.unique(np.concatenate([hs[0][:20], rng.integers(0, 2**32, 100, dtype=np.uint32)]))
padded0 = np.zeros(128, np.uint32); padded0[:q0.shape[0]] = q0
req0 = (padded0, int(q0.shape[0]), options)
params = _params_for(128)
for b in BATCH_SIZES:
    searcher._run_batch_traced(snap, params, [req0]*b)

# stub launch with canned outputs
canned = {}
real_launch = searcher._launch
for b in BATCH_SIZES:
    canned[b] = np.asarray(jax.device_get(real_launch(snap, params, searcher._pack_batch(params, [req0]*b, b))))
searcher._launch = lambda s, p, pin: canned[pin.shape[0]]

# pre-generate queries
n_q = 4096
targets = rng.integers(1, N+1, n_q, dtype=np.uint32)
hs_all = doc_hashes(targets, HASHES_PER_DOC)
noise = rng.integers(0, 2**32, (n_q, 100), dtype=np.uint32)
qs = [np.unique(np.concatenate([hs_all[i,:20], noise[i]])).tolist() for i in range(n_q)]

INFLIGHT = 2048
SECONDS = 12.0
sem = threading.BoundedSemaphore(INFLIGHT)
handles = queue.Queue()
stop_t = time.time() + SECONDS
n_sub, n_reap = 4, 6
done = [0]*n_reap

def submitter(k):
    r = np.random.default_rng(7000+k)
    while time.time() < stop_t:
        sem.acquire()
        q = qs[int(r.integers(0, n_q))]
        handles.put(searcher.submit(snap, q, options))

def reaper(k):
    while True:
        h = handles.get()
        if h is None: return
        h.result(); sem.release(); done[k] += 1

subs = [threading.Thread(target=submitter, args=(k,)) for k in range(n_sub)]
reaps = [threading.Thread(target=reaper, args=(k,)) for k in range(n_reap)]
t0 = time.time()
for t in subs+reaps: t.start()
for t in subs: t.join()
for _ in reaps: handles.put(None)
for t in reaps: t.join()
wall = time.time() - t0
print(f"hostonly_qps={sum(done)/wall:.0f} queries={sum(done)} wall={wall:.1f}")

# per-stage single-thread microbench
q = qs[0]
t0=time.time()
for _ in range(20000): searcher.prepare_query(q)
print(f"prepare_query: {(time.time()-t0)/20000*1e6:.1f} us")
rows = [padded0 for _ in range(256)]
padded4 = np.zeros(132, np.uint32); padded4[:128+4] = np.concatenate([padded0,[q0.shape[0],40,6,10]]).astype(np.uint32)
rows4 = [padded4]*256
t0=time.time()
for _ in range(500): searcher._pack_rows_rebucketed(params, 128, rows4, 256)
print(f"pack_rows_rebucketed(256): {(time.time()-t0)/500*1e6:.1f} us/batch = {(time.time()-t0)/500/256*1e6:.2f} us/query")
row = canned[256][0]
t0=time.time()
for _ in range(20000): searcher._materialize_row(row, (row.shape[0]-5)//2)
print(f"materialize_row: {(time.time()-t0)/20000*1e6:.1f} us")
t0=time.time()
for _ in range(20000): searcher.submit(snap, q, options)
print(f"submit(+claim later): {(time.time()-t0)/20000*1e6:.1f} us")
searcher._pending = []
searcher.close()
