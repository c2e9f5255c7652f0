"""Offline prototype: vectorized window-text span builder vs the current
per-window Python loop in dedup._window_text_spans.

The candidate kernel builds ALL window strings of a batch with one numpy
gather into a single byte buffer + one pa.StringArray.from_buffers call —
no per-window Python string slicing, no per-row boxing. Run:

    python scripts/proto_window_text_vec.py [n_docs] [reps]

Prints correctness (exact equality against the reference loop, including
non-ASCII and edge cases) and per-rep kernel walls.
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, "/root/repo")

from duckdb_spatial_spark.operators._ascii import ws_split


def ref_windows(docs: list[tuple[int, str | None]], w: int):
    """Reference: the current per-window loop."""
    ids, ss, wts = [], [], []
    for did, text in docs:
        if text is None:
            continue
        toks = ws_split(str(text))
        if len(toks) < w:
            continue
        joined = " ".join(toks)
        tl = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
        off = np.zeros(len(toks) + 1, dtype=np.int64)
        np.cumsum(tl + 1, out=off[1:])
        nwin = len(toks) - w + 1
        a = off[:nwin]
        b = off[w : w + nwin] - 1
        for s in range(nwin):
            ids.append(did)
            ss.append(s)
            wts.append(joined[a[s] : b[s]])
    return ids, ss, wts


def vec_windows(ids_arr: pa.Array, texts_arr: pa.Array, w: int):
    """Candidate: batch-global vectorized builder.

    Per doc: one regex split (C), one join (C), one utf-8 encode (C).
    Per window: ZERO Python — byte ranges come from numpy offset math,
    the window bytes from one fancy-index gather, and the output string
    column from one pa.StringArray.from_buffers.
    """
    texts = texts_arr.to_pylist()
    bufs: list[bytes] = []
    row_idx: list[int] = []  # input row index per emitted doc
    starts: list[np.ndarray] = []
    ends: list[np.ndarray] = []
    nwins: list[int] = []
    pos = 0
    for i, text in enumerate(texts):
        if text is None:
            continue
        toks = ws_split(str(text))
        if len(toks) < w:
            continue
        joined = " ".join(toks)
        jb = joined.encode("utf-8")
        if len(jb) == len(joined):
            tl = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
        else:  # non-ASCII: token lengths in BYTES
            tl = np.fromiter(
                (len(t.encode("utf-8")) for t in toks), dtype=np.int64, count=len(toks)
            )
        off = np.zeros(len(toks) + 1, dtype=np.int64)
        np.cumsum(tl + 1, out=off[1:])
        nwin = len(toks) - w + 1
        starts.append(pos + off[:nwin])
        ends.append(pos + off[w : w + nwin] - 1)
        nwins.append(nwin)
        row_idx.append(i)
        bufs.append(jb)
        pos += len(jb)
    if not row_idx:
        return (
            ids_arr.take(pa.array([], type=pa.int64())),
            np.array([], dtype=np.int64),
            pa.array([], type=pa.string()),
        )
    big = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    a = np.concatenate(starts)
    b = np.concatenate(ends)
    wl = b - a
    n = len(a)
    voff = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(wl, out=voff[1:])
    total = int(voff[-1])
    # gather indices: for window k, big[a[k] : a[k]+wl[k]]
    idx = np.arange(total, dtype=np.int64) - np.repeat(voff[:-1] - a, wl)
    values = big[idx]
    if total <= 2**31 - 1:
        wts = pa.StringArray.from_buffers(
            n, pa.py_buffer(voff.astype(np.int32)), pa.py_buffer(values)
        )
    else:
        wts = pa.LargeStringArray.from_buffers(
            n, pa.py_buffer(voff), pa.py_buffer(values)
        )
    nw = np.asarray(nwins, dtype=np.int64)
    doc_take = np.repeat(np.asarray(row_idx, dtype=np.int64), nw)
    ids = ids_arr.take(pa.array(doc_take))
    # _s: 0..nwin-1 per doc = global arange minus each doc's first slot
    first = np.zeros(len(nw) + 1, dtype=np.int64)
    np.cumsum(nw, out=first[1:])
    ss = np.arange(int(first[-1]), dtype=np.int64) - np.repeat(first[:-1], nw)
    return ids, ss, wts


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    w = 8
    rng = np.random.default_rng(7)
    vocab = [f"tok{i}" for i in range(997)] + ["ναι", "日本語", "x" * 40, "ému"]
    docs = []
    for i in range(n_docs):
        n_tok = int(rng.integers(0, 120))
        words = [vocab[int(j)] for j in rng.integers(0, len(vocab), n_tok)]
        t = " ".join(words)
        if i % 17 == 0:
            t = "  " + t.replace(" ", "\t", 3) + " \n"
        docs.append((i, None if i % 53 == 0 else t))
    # edge cases
    docs += [(n_docs, ""), (n_docs + 1, "a b c"), (n_docs + 2, " \t\n ")]

    ids_arr = pa.array([d for d, _ in docs], type=pa.int64())
    texts_arr = pa.array([t for _, t in docs], type=pa.string())

    r_ids, r_ss, r_wts = ref_windows(docs, w)
    v_ids, v_ss, v_wts = vec_windows(ids_arr, texts_arr, w)
    assert list(v_ids.to_pylist()) == r_ids, "ids mismatch"
    assert list(v_ss) == r_ss, "starts mismatch"
    assert v_wts.to_pylist() == r_wts, "window text mismatch"
    print(f"correctness OK: {len(r_ids)} windows, non-ASCII + edge cases included")

    for rep in range(reps):
        t0 = time.time()
        ref_windows(docs, w)
        t_ref = time.time() - t0
        t0 = time.time()
        vec_windows(ids_arr, texts_arr, w)
        t_vec = time.time() - t0
        print(f"rep {rep}: ref {t_ref:.3f}s  vec {t_vec:.3f}s  speedup {t_ref / max(t_vec, 1e-9):.2f}x")


if __name__ == "__main__":
    main()
