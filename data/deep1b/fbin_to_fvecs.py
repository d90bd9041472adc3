#!/usr/bin/env python
"""Convert big-ann-benchmarks .fbin files to .fvecs (streaming).

.fbin layout: int32 n, int32 d, then n*d float32 row-major.
"""
import sys
import numpy as np

def main(src, dst, chunk=1_000_000):
    with open(src, "rb") as f:
        n, d = np.fromfile(f, dtype=np.int32, count=2)
        print(f"{src}: {n} x {d}")
        with open(dst, "wb") as out:
            header = np.full((chunk, 1), d, dtype=np.int32)
            done = 0
            while done < n:
                rows = min(chunk, n - done)
                x = np.fromfile(f, dtype=np.float32, count=rows * d).reshape(rows, d)
                buf = np.concatenate([header[:rows], x.view(np.int32)], axis=1)
                buf.tofile(out)
                done += rows
                print(f"\r{done}/{n}", end="", flush=True)
    print("\ndone")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
