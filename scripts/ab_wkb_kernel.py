"""r17 kernel A/B: per-row-boxed WKB emission (pandas_udf shape) vs the
zero-boxing arrow_udf shape (pa.Array in -> BinaryArray.from_buffers out),
including BOTH boundary conversions each side actually pays in Spark.

  old_point / old_env   numpy record build -> .tobytes() -> per-row bytes
                        slices -> pd.Series -> pa.Array.from_pandas
  new_point / new_env   numpy record build -> one from_buffers call
                        (validity bitmap via packbits; no Python objects)

Byte-identity of every valid row and null placement are asserted.
Usage: python scripts/ab_wkb_kernel.py [n_rows] [reps]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa

n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

rng = np.random.default_rng(7)
xs = rng.uniform(0, 10000, n)
ys = rng.uniform(0, 10000, n)
null_at = rng.integers(0, n, n // 1000)
xs[null_at] = np.nan


def old_point(x: pd.Series, y: pd.Series) -> pa.Array:
    xv = x.to_numpy(dtype=np.float64, na_value=np.nan)
    yv = y.to_numpy(dtype=np.float64, na_value=np.nan)
    m = len(xv)
    buf = np.zeros((m, 21), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1] = 1
    buf[:, 5:13] = xv.astype("<f8").view(np.uint8).reshape(m, 8)
    buf[:, 13:21] = yv.astype("<f8").view(np.uint8).reshape(m, 8)
    rows = buf.tobytes()
    nan = np.isnan(xv) | np.isnan(yv)
    s = pd.Series(
        [None if nan[i] else rows[i * 21 : (i + 1) * 21] for i in range(m)]
    )
    return pa.Array.from_pandas(s, type=pa.binary())


def _record_array(recs: np.ndarray, width: int, nan: np.ndarray) -> pa.Array:
    m = len(recs) // width
    offsets = (np.arange(m + 1, dtype=np.int32) * width)
    if nan.any():
        validity = pa.py_buffer(np.packbits(~nan, bitorder="little"))
        nulls = int(nan.sum())
    else:
        validity, nulls = None, 0
    return pa.Array.from_buffers(
        pa.binary(), m,
        [validity, pa.py_buffer(offsets), pa.py_buffer(recs)],
        null_count=nulls,
    )


def new_point(x: pa.Array, y: pa.Array) -> pa.Array:
    xv = np.asarray(x.to_numpy(zero_copy_only=False), dtype=np.float64)
    yv = np.asarray(y.to_numpy(zero_copy_only=False), dtype=np.float64)
    m = len(xv)
    buf = np.zeros((m, 21), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1] = 1
    buf[:, 5:13] = xv.astype("<f8").view(np.uint8).reshape(m, 8)
    buf[:, 13:21] = yv.astype("<f8").view(np.uint8).reshape(m, 8)
    nan = np.isnan(xv) | np.isnan(yv)
    return _record_array(buf.reshape(-1), 21, nan)


def old_env(a, b, c, d) -> pa.Array:
    cols = [s.to_numpy(dtype=np.float64, na_value=np.nan) for s in (a, b, c, d)]
    av, bv, cv, dv = cols
    m = len(av)
    buf = np.zeros((m, 93), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1] = 3
    buf[:, 5] = 1
    buf[:, 9] = 5
    ring = np.empty((m, 10), dtype=np.float64)
    ring[:, 0], ring[:, 1] = av, bv
    ring[:, 2], ring[:, 3] = av, dv
    ring[:, 4], ring[:, 5] = cv, dv
    ring[:, 6], ring[:, 7] = cv, bv
    ring[:, 8], ring[:, 9] = av, bv
    buf[:, 13:93] = ring.astype("<f8").view(np.uint8).reshape(m, 80)
    nulls = np.isnan(av) | np.isnan(bv) | np.isnan(cv) | np.isnan(dv)
    rows = buf.tobytes()
    s = pd.Series(
        [None if nulls[i] else rows[i * 93 : (i + 1) * 93] for i in range(m)]
    )
    return pa.Array.from_pandas(s, type=pa.binary())


def new_env(a: pa.Array, b: pa.Array, c: pa.Array, d: pa.Array) -> pa.Array:
    cols = [
        np.asarray(s.to_numpy(zero_copy_only=False), dtype=np.float64)
        for s in (a, b, c, d)
    ]
    av, bv, cv, dv = cols
    m = len(av)
    buf = np.zeros((m, 93), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1] = 3
    buf[:, 5] = 1
    buf[:, 9] = 5
    ring = np.empty((m, 10), dtype=np.float64)
    ring[:, 0], ring[:, 1] = av, bv
    ring[:, 2], ring[:, 3] = av, dv
    ring[:, 4], ring[:, 5] = cv, dv
    ring[:, 6], ring[:, 7] = cv, bv
    ring[:, 8], ring[:, 9] = av, bv
    buf[:, 13:93] = ring.astype("<f8").view(np.uint8).reshape(m, 80)
    nan = np.isnan(av) | np.isnan(bv) | np.isnan(cv) | np.isnan(dv)
    return _record_array(buf.reshape(-1), 93, nan)


def main():
    px, py = pd.Series(xs), pd.Series(ys)
    ax, ay = pa.array(xs), pa.array(ys)

    # correctness: byte identity + null placement (smaller slice)
    k = 200_000
    o = old_point(px[:k], py[:k])
    v = new_point(ax.slice(0, k), ay.slice(0, k))
    assert o.to_pylist() == v.to_pylist(), "point mismatch"
    o = old_env(px[:k], py[:k], px[:k] + 1, py[:k] + 1)
    v = new_env(
        ax.slice(0, k), ay.slice(0, k),
        pa.array(xs[:k] + 1), pa.array(ys[:k] + 1),
    )
    assert o.to_pylist() == v.to_pylist(), "envelope mismatch"
    print(f"correctness OK ({k} rows incl. nulls)")

    for rep in range(reps):
        t0 = time.time(); old_point(px, py); t_op = time.time() - t0
        t0 = time.time(); new_point(ax, ay); t_np = time.time() - t0
        t0 = time.time(); old_env(px, py, px, py); t_oe = time.time() - t0
        t0 = time.time(); new_env(ax, ay, ax, ay); t_ne = time.time() - t0
        print(
            f"rep {rep}: point old {t_op:.3f}s new {t_np:.3f}s ({t_op/t_np:.1f}x)"
            f"  env old {t_oe:.3f}s new {t_ne:.3f}s ({t_oe/t_ne:.1f}x)"
        )


if __name__ == "__main__":
    main()
